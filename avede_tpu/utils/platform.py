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
