from equihgnn_tpu.train.metrics import EvalAccumulator, bootstrap_metrics  # noqa: F401
from equihgnn_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from equihgnn_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
