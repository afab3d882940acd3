from maskedsst_tpu.ops.pos_embed import (  # noqa: F401
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)
