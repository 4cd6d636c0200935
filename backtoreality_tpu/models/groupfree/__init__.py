"""GroupFree3D detector family."""

from backtoreality_tpu.models.groupfree.backbone import GFBackbone
from backtoreality_tpu.models.groupfree.modules import (
    PointsObjClsModule,
    PositionEmbeddingLearned,
    PredictHead,
)
from backtoreality_tpu.models.groupfree.transformer import (
    TransformerDecoderLayer,
)
from backtoreality_tpu.models.groupfree.detector import GroupFreeDetector
from backtoreality_tpu.models.groupfree.da import (
    CALayer,
    GroupFreeDetectorDA,
    GroupFreeDetectorDAJitter,
)
