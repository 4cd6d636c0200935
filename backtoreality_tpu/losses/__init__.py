"""Training criteria for the FSB / WSB / BR / BR+CenterRefine recipes."""

from backtoreality_tpu.losses import votenet as votenet_losses
from backtoreality_tpu.losses import groupfree as groupfree_losses
