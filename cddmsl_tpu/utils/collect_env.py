"""Environment report (reference detectron2/utils/collect_env.py, dumped by
default_setup): jax/flax/optax versions, devices, platform."""

import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"backend: {jax.default_backend()}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    for mod in ("flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            lines.append(f"{mod}: {m.__version__}")
        except Exception:
            lines.append(f"{mod}: unavailable")
    try:
        import orbax.checkpoint as ocp  # noqa

        lines.append("orbax: available")
    except Exception:
        lines.append("orbax: unavailable")
    return "\n".join(lines)
