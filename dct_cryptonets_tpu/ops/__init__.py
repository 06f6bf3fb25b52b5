from .dct import (  # noqa: F401
    dct_basis,
    blockwise_dct2,
    blockwise_idct2,
)
