"""Module-path shim for the reference's models/shapeformer/common.py (the
sparse token codec + sampling helpers); canonical implementations live in
shapeformer_tpu.ops."""
from ...ops.sparse import (convonet_to_shapeformer,  # noqa: F401
                           dense2sparse, filter_end_tokens, get_mode,
                           np_dense2sparse, np_sparse2dense, seq_lengths,
                           sparse2dense, sparse_convonet_to_shapeformer,
                           token_mask)
from ...ops.sampling import (filter_logits, log_prob_of,  # noqa: F401
                             sample_categorical, sample_logits)
