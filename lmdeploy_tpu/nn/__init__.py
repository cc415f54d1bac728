from .layers import (apply_rope, make_rope_table, rms_norm, silu_mlp)  # noqa: F401
