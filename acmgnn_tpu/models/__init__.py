from acmgnn_tpu.models.layers import ACMConv, MLPBlock
from acmgnn_tpu.models.models import ACMGNN, MODEL_TYPES

__all__ = ["ACMConv", "MLPBlock", "ACMGNN", "MODEL_TYPES"]
