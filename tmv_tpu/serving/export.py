"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference serves by reconstructing the Python model class and loading a
checkpoint inside every uWSGI worker (`views/object_detection.py:13-37`) —
serving requires the full training codebase.  The TPU-native replacement
exports the warm predictor (forward + decode + class-aware NMS, everything
``DetectionService`` calls) to a self-contained StableHLO artifact:

- deploy target needs only jax + the artifact file, no model zoo import;
- tracing/compilation happen at *export* time, not worker start;
- the artifact pins input shapes/dtypes — the serving contract is explicit.

Parameters stay an argument (not baked constants), so one artifact serves
any checkpoint with the same structure; pass ``bake_variables=True`` to
freeze them in for single-file deployment.
"""

import io
import json
import os
import tarfile
from typing import Any, Callable, Optional

import numpy as np

_MAGIC = "tmv-export-v1"


def _shape_structs(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "shape") or not hasattr(x, "dtype")
        else jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree,
    )


def export_predictor(
    predict_fn: Callable,
    variables: Any,
    example_image: np.ndarray,
    path: Optional[str] = None,
    bake_variables: bool = False,
    platforms=("tpu", "cpu"),
    meta: Optional[dict] = None,
) -> bytes:
    """Serialize ``predict_fn(variables, image)`` to a StableHLO artifact.

    Returns the artifact bytes; also writes them to ``path`` if given.
    ``platforms`` lists lowering targets — the default artifact runs on
    both TPU and CPU backends.  ``meta`` (JSON-serializable dict) is stored
    alongside the program; the input shape/dtype are always recorded so a
    server can validate its configuration against the artifact
    (``read_export_meta``).

    Portability note: build ``predict_fn`` with an explicit
    ``nms_backend='xla'`` (``make_yolo_predict``) — that pins the portable
    NMS path *in the closure*.  The module-global backend flip below only
    protects predictors that have not been traced yet; a predictor already
    traced on TPU carries the Pallas kernel in its jit cache.
    """
    import jax
    from jax import export as jexport

    if bake_variables:
        fn = jax.jit(lambda image: predict_fn(variables, image))
        args = (_shape_structs(example_image),)
    else:
        fn = jax.jit(predict_fn)
        args = (_shape_structs(variables), _shape_structs(example_image))

    # Trace with the portable XLA NMS path: the Pallas kernel only lowers
    # for the backend it runs on, and artifacts target several platforms.
    import importlib

    # must be the module: ops.__init__ re-exports a same-named function,
    # which shadows the submodule as a package attribute
    _nms = importlib.import_module("tmv_tpu.ops.nms")
    prev_backend = _nms._BACKEND
    _nms.set_nms_backend("xla")
    try:
        exp = jexport.export(fn, platforms=list(platforms))(*args)
    finally:
        _nms.set_nms_backend(prev_backend)
    blob = exp.serialize()

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add("MAGIC", _MAGIC.encode())
        add("BAKED", (b"1" if bake_variables else b"0"))
        img = np.asarray(example_image)
        full_meta = dict(meta or {})
        full_meta.setdefault("input_shape", list(img.shape))
        full_meta.setdefault("input_dtype", str(img.dtype))
        full_meta.setdefault("platforms", list(platforms))
        add("META", json.dumps(full_meta).encode())
        add("fn.stablehlo", bytes(blob))
    out = buf.getvalue()
    if path:
        with open(path, "wb") as f:
            f.write(out)
    return out


def load_predictor(path_or_bytes) -> Callable:
    """Load an exported artifact → callable with the original signature.

    If the artifact was exported with ``bake_variables=True`` the returned
    callable still accepts ``(variables, image)`` and ignores ``variables``
    (so it drops into ``DetectionService`` unchanged with ``variables=None``).
    """
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()

    with tarfile.open(fileobj=io.BytesIO(raw)) as tar:
        def read(name):
            member = tar.extractfile(name)
            assert member is not None, f"missing {name} in artifact"
            return member.read()

        magic = read("MAGIC").decode()
        if magic != _MAGIC:
            raise ValueError(f"not a tmv export artifact (magic={magic!r})")
        baked = read("BAKED") == b"1"
        exp = jexport.deserialize(read("fn.stablehlo"))

    if baked:
        def call(variables, image):
            return exp.call(image)
    else:
        def call(variables, image):
            return exp.call(variables, image)

    return call


def read_export_meta(path_or_bytes) -> dict:
    """Read the artifact's META dict (input shape/dtype, platforms, extras).

    Artifacts written before META existed return ``{}``.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    with tarfile.open(fileobj=io.BytesIO(raw)) as tar:
        try:
            member = tar.extractfile("META")
        except KeyError:
            return {}
        if member is None:
            return {}
        return json.loads(member.read().decode())


def export_file_size(path: str) -> int:
    return os.path.getsize(path)
