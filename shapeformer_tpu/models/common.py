"""Module-path shim: the reference keeps a duplicate sparse-codec module at
shapeformer/models/common.py (same content as models/shapeformer/common.py,
SURVEY.md section 2.1 row 24).  Re-export the canonical implementations."""
from ..ops.sparse import (convonet_to_shapeformer,  # noqa: F401
                          dense2sparse, filter_end_tokens, np_dense2sparse,
                          np_sparse2dense, sparse2dense,
                          sparse_convonet_to_shapeformer, token_mask)
from ..ops.sampling import filter_logits, sample_logits  # noqa: F401
from ..ops.metrics import chamfer_distance, compute_iou  # noqa: F401
