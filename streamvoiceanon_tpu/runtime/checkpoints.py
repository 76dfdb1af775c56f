"""Native checkpoint save/load for the full converter (Orbax).

The torch->JAX conversion (runtime/convert.py) is a one-time import path;
converted parameter trees are persisted natively with Orbax so serving hosts
never need torch.  Layout: one directory with a subtree per model.
"""

from __future__ import annotations

import os
from typing import Optional

from streamvoiceanon_tpu.config import PipelineConfig
from streamvoiceanon_tpu.runtime.pipeline import VoiceConverter

_PARTS = ("tokenizer", "vocoder", "arvc", "campplus", "speaker")


def save(cv: VoiceConverter, path: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    for name in _PARTS:
        params = getattr(cv, f"{name}_params")
        if params is not None:
            ckptr.save(os.path.join(path, name), params, force=True)
    ckptr.wait_until_finished()
    return path


def load(path: str, cfg: Optional[PipelineConfig] = None,
         templates: Optional[dict] = None) -> VoiceConverter:
    """Restore a converter.  `templates` (same tree structure, e.g. from the
    random init fns) enables sharded/typed restoration; without it Orbax
    restores with saved metadata."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    cfg = cfg or PipelineConfig()
    ckptr = ocp.StandardCheckpointer()
    out = {}
    for name in _PARTS:
        p = os.path.join(path, name)
        if os.path.isdir(p):
            tpl = (templates or {}).get(name)
            out[f"{name}_params"] = (
                ckptr.restore(p, tpl) if tpl is not None else ckptr.restore(p)
            )
        else:
            out[f"{name}_params"] = None
    return VoiceConverter(cfg=cfg, **out)
