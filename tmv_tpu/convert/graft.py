"""Weight grafting: copy matching leaves between param pytrees.

The MoCo→detection fine-tune flow
(`momentum_contrast/train_object_detection.py:40-…` loads pretrained
weights into a detector whose output convs differ) and the teacher-
promotion flow both need "copy every leaf whose path and shape match,
keep fresh init elsewhere".
"""

from typing import Any, Dict, List, Tuple

import numpy as np


def graft_params(dst: Dict, src: Dict) -> Tuple[Dict, List, List]:
    """Return a copy of ``dst`` with matching leaves replaced from ``src``.

    A leaf matches when the same key path exists in ``src`` and shapes
    agree.  Returns (grafted, copied_paths, skipped_paths) where skipped
    lists paths present in both trees with mismatched shapes (e.g. the
    detection head convs after changing class count).
    """
    copied: List = []
    skipped: List = []

    def rec(d, s, path):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rec(v, s.get(k, {}) if isinstance(s, dict) else {},
                             path + (k,))
            else:
                sv = s.get(k) if isinstance(s, dict) else None
                if sv is not None and not isinstance(sv, dict) and \
                        tuple(np.shape(sv)) == tuple(np.shape(v)):
                    out[k] = sv
                    copied.append(path + (k,))
                else:
                    out[k] = v
                    if sv is not None:
                        skipped.append(path + (k,))
        return out

    return rec(dst, src, ()), copied, skipped
