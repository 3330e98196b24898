"""Dataset registry — importing this package registers every dataset name.

Registered names mirror `reference equihgnn/data/__init__.py:1-24` (plus
`qm9_g_3d`, which the reference registers without exporting, SURVEY §2.2),
and add `synthetic_*` datasets for RDKit-free environments.
"""

from equihgnn_tpu.data.datasets.base import MolDataset  # noqa: F401
from equihgnn_tpu.data.datasets.synthetic_ds import (  # noqa: F401
    SyntheticHGraph,
    SyntheticHGraph3D,
    SyntheticGraph,
    SyntheticGraph3D,
)
from equihgnn_tpu.data.datasets.qm9 import (  # noqa: F401
    QM9HGraph,
    QM9HGraph3D,
    QM9Graph,
    QM9Graph3D,
)
from equihgnn_tpu.data.datasets.opv import (  # noqa: F401
    OPVHGraph,
    OPVHGraph3D,
    OPVGraph,
    OPVGraph3D,
)
from equihgnn_tpu.data.datasets.pcqm4 import (  # noqa: F401
    PCQM4Mv2HGraph,
    PCQM4Mv2Graph,
)
from equihgnn_tpu.data.datasets.molecule3d import (  # noqa: F401
    MoleculeHGraph,
    MoleculeGraph,
)
