"""Model zoo: DiM (hybrid Mamba spatial-frequency) and DiT baselines."""

from dimsum_tpu.models.dim import (  # noqa: F401
    DiM,
    DiMConfig,
    DiM_models,
    forward_with_cfg,
    forward_with_adacfg,
)
from dimsum_tpu.models.dit import DiT, DiTConfig, DiT_models  # noqa: F401
from dimsum_tpu.models.factory import create_model  # noqa: F401
from dimsum_tpu.models.mamba import Mamba, CondMamba  # noqa: F401
