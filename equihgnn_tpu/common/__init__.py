from equihgnn_tpu.common.registry import registry  # noqa: F401
