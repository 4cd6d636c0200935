"""VoteNet detector family."""

from backtoreality_tpu.models.votenet.backbone import (
    Pointnet2Backbone,
    Pointnet2BackboneCam,
    Pointnet2BackboneJitter,
)
from backtoreality_tpu.models.votenet.voting import VotingModule
from backtoreality_tpu.models.votenet.proposal import (
    ProposalModule,
    decode_scores,
)
from backtoreality_tpu.models.votenet.votenet import VoteNet
from backtoreality_tpu.models.votenet.da import (
    VoteNetDA,
    VoteNetDAJitter,
    VoteNetDAJitter2,
)
from backtoreality_tpu.models.votenet.boxnet import BoxNet
