from equihgnn_tpu.nn.mlp import MLP, PlainMLP, TorchLinear, MaskedBatchNorm, PReLU  # noqa: F401
from equihgnn_tpu.nn.encoders import AtomEncoder, BondEncoder, HedgeEncoder  # noqa: F401
from equihgnn_tpu.nn.hgconv import MHNNConv, MHNNSConv  # noqa: F401
