"""TPU-native kernels and primitive ops (Pallas + XLA)."""

from dimsum_tpu.ops.selective_scan import (  # noqa: F401
    selective_scan,
    selective_scan_ref,
    selective_scan_xla,
    selective_scan_pallas,
    selective_state_update,
)
from dimsum_tpu.ops.causal_conv1d import (  # noqa: F401
    causal_conv1d,
    causal_conv1d_update,
)
from dimsum_tpu.ops.norms import (  # noqa: F401
    rms_norm,
    layer_norm,
    fused_add_norm,
    modulate,
)
from dimsum_tpu.ops.wavelet import (  # noqa: F401
    dwt2d,
    idwt2d,
    dwt_tokens,
    idwt_tokens,
)
from dimsum_tpu.ops.dct import (  # noqa: F401
    dct_basis,
    dct_patch,
    idct_patch,
    dct_2d,
    idct_2d,
)
from dimsum_tpu.ops.scan_orders import (  # noqa: F401
    SCAN_ZOO,
    sweep_path,
    zigma_path,
    jpeg_zigzag,
    reverse_permut_np,
    local_scan,
    local_reverse,
    apply_permutation,
    build_layer_paths,
)
