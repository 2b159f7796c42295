"""Model export for deployment.

The TPU-native equivalent of the reference export stack (detectron2/export/:
torchscript/caffe2 tracing, 3701 LoC): a jitted inference function is
serialized as StableHLO via `jax.export` — a stable, runtime-loadable
artifact (the XLA ecosystem's TorchScript analogue), plus the params tree.
"""

import logging
import os
import pickle
from typing import Any, Callable, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def export_inference(fn: Callable, example_args: Tuple, out_dir: str) -> str:
    """Serialize jit(fn) at the example shapes to <out_dir>/model.stablehlo
    plus pickled host params. Returns the directory."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    # Raw StableHLO bytecode: directly compilable by any PJRT plugin
    # (PJRT_Client_Compile, format "mlir") — what the C++ deploy runtime
    # (tools/deploy/pjrt_runner.cpp) loads; the .stablehlo artifact above
    # additionally carries jax calling-convention metadata for
    # load_exported.
    with open(os.path.join(out_dir, "model.mlir"), "wb") as f:
        f.write(exported.mlir_module_serialized)
    for i, a in enumerate(example_args):
        np.save(os.path.join(out_dir, f"input_{i}.npy"), np.asarray(a))
    meta = {
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
    }
    with open(os.path.join(out_dir, "export_meta.pkl"), "wb") as f:
        pickle.dump(meta, f)
    logger.info("exported %s (%d bytes) for platforms %s", out_dir, len(blob), meta["platforms"])
    return out_dir


def load_exported(out_dir: str):
    """Load a serialized export; returns a callable running the module."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
