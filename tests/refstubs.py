"""Stub modules that let the reference code import without its missing deps.

`vector_quantize_pytorch` (used by modules/vqgan/modules/fsq.py) and `einx`
(used by modules/bicodec_speaker_encoder/fsq/residual_fsq.py) are not in this
image.  The repo carries its own equivalent ResidualFSQ implementation
(modules/bicodec_speaker_encoder/fsq/), so we stub einx.get_at for the one
pattern it uses and alias vector_quantize_pytorch to that implementation.
"""

import sys
import types


def install():
    if "einx" not in sys.modules:
        einx = types.ModuleType("einx")

        def get_at(pattern, codebooks, indices):
            assert pattern == "q [c] d, b n q -> q b n d", pattern
            # codebooks: (q, c, d); indices: (b, n, q)
            return codebooks[
                __import__("torch").arange(codebooks.shape[0])[:, None, None],
                indices.permute(2, 0, 1),
            ]

        einx.get_at = get_at
        sys.modules["einx"] = einx

    if "vector_quantize_pytorch" not in sys.modules:
        from modules.bicodec_speaker_encoder.fsq import residual_fsq as rf

        vqpt = types.ModuleType("vector_quantize_pytorch")
        vqpt.GroupedResidualFSQ = rf.GroupedResidualFSQ
        vqpt.ResidualFSQ = rf.ResidualFSQ
        sys.modules["vector_quantize_pytorch"] = vqpt
