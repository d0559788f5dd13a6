"""Test fixtures.

Strategy mirrors the reference's (SURVEY.md §4): synthetic images/videos,
no real weights — plus the TPU-rebuild addition: all tests run on a
virtual 8-device CPU backend so every sharding/collective path is
exercised without TPU hardware (the mesh-parallel analog of the
reference's mock-the-model approach).
"""

import os

# Must happen before jax initializes a backend. Note: this image's
# sitecustomize pre-registers an 'axon' TPU platform and pins
# JAX_PLATFORMS=axon, so the env var alone is not enough — we override
# the jax config directly (works because backends initialize lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: identical programs (tiny models rebuilt
# per fixture) hit disk instead of recompiling, across tests AND runs
jax.config.update("jax_compilation_cache_dir", "/tmp/avede_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_frames(rng):
    """Small uint8 frame stack [N, H, W, 3]."""
    return rng.integers(0, 255, size=(24, 64, 96, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def tiny_clip():
    from avede_tpu.models.clip import init_clip, tiny_test_config
    model, params = init_clip(tiny_test_config(), seed=0)
    return model, params


@pytest.fixture()
def tmp_data_dirs(tmp_path, monkeypatch):
    """Point settings at a temp data tree."""
    from avede_tpu.utils.config import settings
    for attr, sub in [("DATA_DIR", ""), ("VIDEO_DIR", "videos"),
                      ("CLIP_DIR", "clips"), ("FRAME_DIR", "frames"),
                      ("EMBEDDING_DIR", "embeddings"), ("IMAGE_DIR", "images"),
                      ("LOG_DIR", "logs")]:
        p = tmp_path / sub if sub else tmp_path
        p.mkdir(exist_ok=True)
        monkeypatch.setattr(settings, attr, str(p))
    return tmp_path


def make_test_video(path, n_frames=75, fps=25.0, size=(96, 64), moving=True):
    """Write a real small mp4 with a moving white square (role of the
    reference's ``tests/conftest.py:211-225`` helper)."""
    import cv2

    w, h = size
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    assert writer.isOpened(), "cv2 VideoWriter failed to open"
    for i in range(n_frames):
        frame = np.full((h, w, 3), 32, dtype=np.uint8)
        if moving:
            x = int((i / max(n_frames - 1, 1)) * (w - 16))
            frame[h // 4: h // 4 + 16, x: x + 16] = 255
        writer.write(frame)
    writer.release()
    return str(path)


@pytest.fixture()
def test_video(tmp_path):
    return make_test_video(tmp_path / "vid.mp4")
