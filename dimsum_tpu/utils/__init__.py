"""Checkpointing and misc utilities."""

from dimsum_tpu.utils.ckpt import (  # noqa: F401
    convert_torch_state_dict,
    load_torch_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
