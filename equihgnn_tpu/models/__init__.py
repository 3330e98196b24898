"""Model registry — importing this package registers every model name.

Registered names mirror `reference equihgnn/models/__init__.py:1-29`.
"""

from equihgnn_tpu.models.config import ModelConfig  # noqa: F401
from equihgnn_tpu.models.mhnn import MHNN, MHNNS, MHNNM  # noqa: F401
from equihgnn_tpu.models.baseline_2d import GNN2D  # noqa: F401
from equihgnn_tpu.models.equihnn_egnn import (  # noqa: F401
    EGNNEquiHNN,
    EGNNEquiHNNS,
    EGNNEquiHNNM,
)
from equihgnn_tpu.models.equihnn_visnet import (  # noqa: F401
    VisNetEquiHNN,
    VisNetEquiHNNS,
    VisNetEquiHNNM,
)
from equihgnn_tpu.models.equihnn_fa_former import (  # noqa: F401
    FAFormerEquiHNN,
    FAFormerEquiHNNS,
    FAFormerEquiHNNM,
)
from equihgnn_tpu.models.equihnn_equiformer import EquiformerEquiHNNS  # noqa: F401
from equihgnn_tpu.models.equihnn_se3_transformer import (  # noqa: F401
    SE3TransformerEquiHNNS,
)
