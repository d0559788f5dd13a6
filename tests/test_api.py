"""API tests (role of reference ``tests/test_api_endpoints.py``): real
aiohttp app + real tiny-CLIP processor over synthetic videos — no route
mocking (the reference mocks the whole processor; here the stack is
cheap enough to run for real)."""

import asyncio
import io

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from tests.conftest import make_test_video


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture()
def api_client(tiny_clip, tmp_data_dirs):
    """Sync-callable API client bound to a tiny-CLIP processor."""
    from avede_tpu.models.clip import tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh
    from avede_tpu.api.app import create_app
    from avede_tpu.services.video_processor import VideoProcessor

    from avede_tpu.models.owlvit import init_owlvit, tiny_owlvit_config
    from avede_tpu.models.yolo import init_yolo, tiny_yolo_config
    from avede_tpu.services.background_independent import \
        BackgroundIndependentService
    from avede_tpu.services.detector import YoloService
    from avede_tpu.services.person_detector import (PersonDetector,
                                                    PersonSearchService)
    from avede_tpu.services.small_object import SmallObjectService
    from avede_tpu.services.universal_detector import UniversalDetector

    model, params = tiny_clip
    engine = ClipEngine(cfg=tiny_test_config(), params=params,
                        mesh=build_mesh())
    processor = VideoProcessor(engine=engine)
    # wire every lazy pipeline with tiny models so endpoint tests never
    # build full-size towers
    ocfg = tiny_owlvit_config()
    _, oparams = init_owlvit(ocfg, seed=0)
    ycfg = tiny_yolo_config()
    _, yvars = init_yolo(ycfg, seed=0)
    yolo = YoloService(cfg=ycfg, variables=yvars)
    ud = UniversalDetector(engine, owlvit_cfg=ocfg, owlvit_params=oparams,
                           yolo=yolo)
    processor._small_object = SmallObjectService(engine, detector=ud,
                                                 tile=64, overlap=16)
    processor._background = BackgroundIndependentService(engine)
    processor._person = PersonSearchService(
        engine, detector=PersonDetector(engine, yolo=yolo))
    from avede_tpu.models.blip import init_blip, tiny_blip_config
    from avede_tpu.models.univtg import tiny_grounding_config
    from avede_tpu.pipelines.phase2 import Phase2Rerank
    from avede_tpu.pipelines.phase3 import Phase3Temporal
    from avede_tpu.services.captioner import CaptionService

    bcfg = tiny_blip_config()
    _, bparams = init_blip(bcfg, seed=0)
    p2 = Phase2Rerank(processor.phase1,
                      captioner=CaptionService(engine, cfg=bcfg,
                                               params=bparams))
    processor._phase2 = p2
    processor._phase3 = Phase3Temporal(p2, cfg=tiny_grounding_config(
        input_dim=engine.cfg.projection_dim))
    app = create_app(processor)

    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())

    class Sync:
        def __init__(self):
            self.loop = loop

        def get(self, path, **kw):
            return loop.run_until_complete(self._req("GET", path, **kw))

        def post(self, path, **kw):
            return loop.run_until_complete(self._req("POST", path, **kw))

        async def _req(self, method, path, **kw):
            resp = await client.request(method, path, **kw)
            body = (await resp.json() if "json" in
                    resp.headers.get("Content-Type", "") else
                    await resp.read())
            return resp.status, body

    yield Sync()
    loop.run_until_complete(client.close())
    loop.close()


class TestBasicEndpoints:
    def test_root_lists_endpoints(self, api_client):
        status, body = api_client.get("/")
        assert status == 200
        assert "/api/query" in body["endpoints"]

    def test_health(self, api_client):
        status, body = api_client.get("/api/health")
        assert status == 200 and body["status"] == "healthy"

    def test_metrics(self, api_client):
        status, body = api_client.get("/api/metrics")
        assert status == 200 and "operations" in body

    def test_matching_modes(self, api_client):
        status, body = api_client.get("/api/matching-modes")
        modes = {m["mode"] for m in body["matching_modes"]}
        assert {"smart_match", "cross_domain", "fast_match"} <= modes

    def test_detection_modes(self, api_client):
        status, body = api_client.get("/api/detection-modes")
        assert {m["mode"] for m in body["detection_modes"]} == {
            "hybrid", "owlvit", "clip", "yolo_enhanced"}

    def test_small_object_capabilities(self, api_client):
        status, body = api_client.get("/api/small-object-capabilities")
        assert "tiled_inference" in body["capabilities"]


class TestUploadAndQuery:
    def test_upload_multipart(self, api_client, tmp_path):
        import aiohttp

        video_file = make_test_video(tmp_path / "up2.mp4")
        form = aiohttp.FormData()
        form.add_field("file", open(video_file, "rb"),
                       filename="up2.mp4", content_type="video/mp4")
        status, body = api_client.post("/api/upload", data=form)
        assert status == 200
        assert body["status"] == "uploaded"
        vid = body["video_id"]

        status, listing = api_client.get("/api/videos")
        assert any(v["video_id"] == vid for v in listing["videos"])

        status, out = api_client.post("/api/query", json={
            "video_id": vid, "query": "white square", "mode": "mvp",
            "threshold": -1.0})
        assert status == 200
        assert out["status"] == "completed"
        assert out["total_found"] > 0

        # clip listing + download
        status, clips = api_client.get("/api/clips")
        assert status == 200 and len(clips["clips"]) > 0
        name = clips["clips"][0]["filename"]
        status, data = api_client.get(f"/api/download/{name}")
        assert status == 200 and len(data) > 0

    def test_advanced_query_via_api(self, api_client, tmp_path):
        """mode=advanced through the REST surface: phase-3 results with
        captions and grounded boundaries; the repeat query is served
        warm from caches (no error, same shape)."""
        import aiohttp

        from tests.conftest import make_test_video

        video_file = str(tmp_path / "adv_api.mp4")
        make_test_video(video_file, n_frames=40)
        form = aiohttp.FormData()
        form.add_field("file", open(video_file, "rb"),
                       filename="adv_api.mp4", content_type="video/mp4")
        status, body = api_client.post("/api/upload", data=form)
        assert status == 200
        vid = body["video_id"]

        payload = {"video_id": vid, "query": "white square",
                   "mode": "advanced", "threshold": -1.0,
                   "extract_clips": False}
        status, out = api_client.post("/api/query", json=payload)
        assert status == 200 and out["status"] == "completed"
        assert out["total_found"] > 0
        for r in out["results"]:
            assert r["phase"] == "phase3_univtg"
            assert "caption" in r
            assert r["start_time"] <= r["timestamp"] <= \
                r["end_time"] + 1e-6
        status, warm = api_client.post("/api/query", json=payload)
        assert status == 200 and warm["status"] == "completed"
        assert warm["total_found"] == out["total_found"]

    def test_query_unknown_video_404(self, api_client):
        status, body = api_client.post("/api/query", json={
            "video_id": "nope", "query": "q"})
        assert status == 404

    def test_query_validation_422(self, api_client):
        status, body = api_client.post("/api/query", json={"query": "q"})
        assert status == 422

    def test_query_invalid_json_422(self, api_client):
        status, body = api_client.post(
            "/api/query", data=b"not json",
            headers={"Content-Type": "application/json"})
        assert status == 422

    def test_download_traversal_blocked(self, api_client):
        status, _ = api_client.get("/api/download/..%2Fsecrets.mp4")
        assert status == 404

    def test_upload_bad_format_rejected(self, api_client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", b"x", filename="evil.exe")
        status, body = api_client.post("/api/upload", data=form)
        assert status == 400


class TestImageEndpoints:
    def test_upload_image_and_list(self, api_client):
        import aiohttp
        import cv2

        img = np.zeros((32, 32, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        form = aiohttp.FormData()
        form.add_field("file", buf.tobytes(), filename="ref.png",
                       content_type="image/png")
        status, body = api_client.post("/api/upload-image", data=form)
        assert status == 200
        image_id = body["image_id"]
        status, listing = api_client.get("/api/images")
        assert any(i["image_id"] == image_id for i in listing["images"])


class TestAdvancedEndpoints:
    """API-level coverage of the endpoints the reference ships broken
    (SURVEY.md §2.6.6) — here they must return completed results."""

    def test_small_object_bg_and_person(self, api_client, tmp_path):
        import aiohttp
        import cv2

        video_file = make_test_video(tmp_path / "adv.mp4", n_frames=30)
        form = aiohttp.FormData()
        form.add_field("file", open(video_file, "rb"),
                       filename="adv.mp4", content_type="video/mp4")
        _, up = api_client.post("/api/upload", data=form)
        vid = up["video_id"]

        img = np.random.default_rng(0).integers(
            0, 255, (96, 64, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".png", img[..., ::-1])
        form = aiohttp.FormData()
        form.add_field("file", buf.tobytes(), filename="p.png",
                       content_type="image/png")
        _, upi = api_client.post("/api/upload-image", data=form)
        image_id = upi["image_id"]

        status, so = api_client.post("/api/small-object-detection", json={
            "video_id": vid, "object_queries": ["white square"],
            "confidence_threshold": -1.0, "min_object_size": 2,
            "max_object_size": 64})
        assert status == 200 and so["status"] == "completed"
        assert "small_objects_found" in so and "enhancement_stats" in so

        status, bg = api_client.post("/api/background-independence", json={
            "video_id": vid, "object_queries": "white square",
            "confidence_threshold": -1.0})
        assert status == 200 and bg["status"] == "completed"
        assert "background_independence_stats" in bg

        status, pd = api_client.post(
            "/api/enhanced-person-detection", json={
                "video_id": vid, "image_id": image_id,
                "similarity_threshold": -1.0, "frame_skip": 10})
        assert status == 200 and pd["status"] == "completed"
        assert "summary" in pd


class TestConcurrency:
    def test_concurrent_queries(self, api_client, tmp_path):
        """5-way concurrent requests against one engine (reference
        tests/test_api_endpoints.py:364-407 role, unmocked)."""
        import aiohttp
        import asyncio

        video_file = make_test_video(tmp_path / "cc.mp4", n_frames=40)
        form = aiohttp.FormData()
        form.add_field("file", open(video_file, "rb"),
                       filename="cc.mp4", content_type="video/mp4")
        _, up = api_client.post("/api/upload", data=form)
        vid = up["video_id"]

        async def one(i):
            # reuse the test client; requests interleave on the loop
            return await api_client._req("POST", "/api/query", json={
                "video_id": vid, "query": f"query {i}", "mode": "mvp",
                "threshold": -1.0})

        async def many():
            return await asyncio.gather(*(one(i) for i in range(5)))

        results = api_client.loop.run_until_complete(many())
        assert all(status == 200 for status, _ in results)
        assert all(body["status"] == "completed" for _, body in results)


class TestLibrarySearch:
    def test_search_across_videos(self, api_client, tmp_path):
        import aiohttp

        for name in ("lib_a", "lib_b"):
            vf = make_test_video(tmp_path / f"{name}.mp4", n_frames=30)
            form = aiohttp.FormData()
            form.add_field("file", open(vf, "rb"),
                           filename=f"{name}.mp4",
                           content_type="video/mp4")
            api_client.post("/api/upload", data=form)

        status, out = api_client.post("/api/search-library", json={
            "query": "white square", "threshold": -1.0, "top_k": 6})
        assert status == 200 and out["status"] == "completed"
        assert out["metadata"]["videos_searched"] >= 2
        vids = {r["video_id"] for r in out["results"]}
        assert len(vids) >= 2  # hits from multiple videos
        confs = [r["confidence"] for r in out["results"]]
        assert confs == sorted(confs, reverse=True)

    def test_search_validation(self, api_client):
        status, _ = api_client.post("/api/search-library", json={})
        assert status == 422
