"""Backend-selection helper.

This build image's sitecustomize force-registers the axon TPU platform
and pins ``JAX_PLATFORMS=axon`` at a level the environment variable
cannot override. ``apply_platform_env()`` makes the env var behave as
documented again: call it before the first JAX computation and the
backend in ``JAX_PLATFORMS`` wins. Used by the CLI entry points
(eval.py, capability_report.py, the API server); tests do the same in
conftest.py.
"""

from __future__ import annotations

import os

_APPLIED = False


def apply_platform_env() -> None:
    global _APPLIED
    if _APPLIED:
        return
    want = os.environ.get("JAX_PLATFORMS", "")
    # the sitecustomize sets exactly "axon"; only intervene when the
    # user asked for something else
    if want and want != "axon":
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; too late to switch
    _APPLIED = True


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at
    ``settings.XLA_CACHE_DIR`` (empty disables).

    Serving processes compile every jitted program at startup — through
    a remote-attached chip that is minutes of wall clock (measured
    147-324 s first-compile for the advanced pipeline alone), paid
    again on every supervisor restart (``robust_server.py``). The
    persistent cache makes restarts reuse prior compiles; numerics are
    unaffected (the cache stores compiled executables keyed by program
    + topology). Idempotent; call before the first computation.
    """
    from .config import settings

    path = settings.XLA_CACHE_DIR
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def compute_dtype() -> str:
    """Inference compute dtype for default-constructed model services.

    ``settings.COMPUTE_DTYPE`` (bfloat16 — the measured-fastest MXU
    dtype: the scan is ~2x float32, YOLO ~5x with pipelining) on
    accelerator backends; float32 on CPU, where bf16 is emulated and
    the virtual-mesh tests expect f32 numerics. Explicitly-passed
    configs are never overridden. Params always stay float32 (flax
    ``dtype`` is the computation dtype only), so converted checkpoints
    and training are unaffected.
    """
    from .config import settings

    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            return "float32"
    except Exception:  # noqa: BLE001 — backend not initializable
        return "float32"
    return settings.COMPUTE_DTYPE


def with_compute_dtype(cfg):
    """Return ``cfg`` (a model config dataclass) with its ``dtype``
    replaced by :func:`compute_dtype`. Used by services on their
    *default*-constructed configs only — explicit configs pass through
    untouched at the call sites."""
    import dataclasses

    return dataclasses.replace(cfg, dtype=compute_dtype())
