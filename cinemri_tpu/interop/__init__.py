"""Interoperability with the reference PyTorch implementation.

``import_torch_checkpoint`` loads a trained reference Lightning ``.ckpt``
(train_test_varnet.py:107-109 artifact) into this framework's parameter
trees, so reference users keep their trained models when switching.
"""

from .torch_import import (  # noqa: F401
    build_kwargs_from_hparams,
    check_tree_matches,
    import_torch_checkpoint,
    tree_from_state_dict,
)
from . import port  # noqa: F401
