"""App layer: the JSON HTTP server surface (split from test_app.py
so xdist --dist loadfile spreads the compile load — CLAUDE.md)."""
import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from diffusionspatialcontrol_tpu import registry
from diffusionspatialcontrol_tpu.app.api import (
    ControlNetUnit,
    ModelManager,
    inference,
)
from diffusionspatialcontrol_tpu.utils import region_ui
from tests.test_pipeline import TINY


@pytest.fixture(scope="module")
def manager():
    m = ModelManager(dtype=jnp.float32)
    m.register_random("tiny", TINY)
    return m


def test_http_server(manager):
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/samplers"
        ) as r:
            samplers = json.loads(r.read())["samplers"]
        assert "DPM++ 2M Karras" in samplers

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {
                    "prompt": "a cat",
                    "model": "tiny",
                    "sampler": "Euler",
                    "steps": 2,
                    "width": 64,
                    "height": 64,
                    "encoding_mode": "short",
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert len(payload["images"]) == 1
    finally:
        server.shutdown()


def test_http_server_multi_prompt(manager):
    import threading as _t  # noqa: F401  (threading imported at module top)
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]
        mask = [[1.0 if x < 32 else 0.0 for x in range(64)]
                for _ in range(64)]
        payload = {
            "prompt": ["a red cat", "a blue dog"],
            "model": "tiny",
            "sampler": "Euler",
            "steps": 2,
            "width": 64,
            "height": 64,
            "seed": [1, 2],
            "encoding_mode": "short",
            "region_state": [
                {"red cat": {"mask": mask, "weight": 1.0}},
                None,
            ],
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert len(out["images"]) == 4
    finally:
        server.shutdown()


def test_http_server_units_and_preprocess(manager):
    from diffusionspatialcontrol_tpu.app.server import serve
    from diffusionspatialcontrol_tpu.models.clip_vision import (
        CLIPVisionConfig,
    )

    manager.register_image_encoder(cfg=CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=32,
    ))
    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.status, json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/preprocessors", timeout=30
        ) as r:
            pp_list = json.loads(r.read())
        assert "Depth" in pp_list["model_based_native"]
        assert "Canny" in pp_list["pure_image"]

        img = np.random.RandomState(0).rand(64, 64, 3).tolist()
        st, out = post("/preprocess", {"preprocessor": "Canny",
                                       "image": img})
        assert st == 200 and isinstance(out["image"], str)

        # /preprocess also accepts base64 image strings like every other
        # image-valued field, and decodes to the same control image
        import base64 as b64
        import io

        from PIL import Image

        u8 = (np.asarray(img) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, "PNG")
        st2, out2 = post("/preprocess", {
            "preprocessor": "Canny",
            "image": b64.b64encode(buf.getvalue()).decode(),
        })
        assert st2 == 200 and isinstance(out2["image"], str)
        # the base64 (0..255) and JSON-list ([0,1]) uploads of the SAME
        # uint8 image must produce the same control image (the 0..255
        # floats used to bypass detector normalization)
        st_l, out_l = post("/preprocess", {
            "preprocessor": "Canny", "image": (u8 / 255.0).tolist(),
        })
        assert st_l == 200 and out_l["image"] == out2["image"]

        # grayscale base64 uploads are expanded to RGB, and model-based
        # detectors get in-range inputs (both 500'd before round 4)
        manager.register_preprocessor("Openpose", detect_resolution=64)
        buf_l = io.BytesIO()
        Image.fromarray(u8[..., 0], mode="L").save(buf_l, "PNG")
        st3, out3 = post("/preprocess", {
            "preprocessor": "Openpose",
            "image": b64.b64encode(buf_l.getvalue()).decode(),
        })
        assert st3 == 200 and isinstance(out3["image"], str)

        st, out = post("/generate", {
            "prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64,
            "encoding_mode": "short",
            "controlnet_units": [
                {"model": "Canny", "image": img, "scale": 0.5,
                 "preprocessor": "Canny"}
            ],
            "ip_adapter_units": [
                {"model": "IP-Adapter",
                 "image": (np.random.RandomState(1).rand(32, 32, 3)
                           ).tolist(),
                 "scale": 0.4}
            ],
        })
        assert st == 200 and len(out["images"]) == 1
    finally:
        server.shutdown()


def test_http_server_img2img_inpaint_and_preview(manager):
    """Server passthrough for init_image / inpaint_mask / latent_preview
    (round-3): img2img and inpaint generate over HTTP, previews return as
    per-step galleries."""
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        base = {
            "prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64,
            "encoding_mode": "short",
        }
        init = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(
            int).tolist()
        out = post({**base, "init_image": init, "strength": 0.5})
        assert len(out["images"]) == 1

        mask = [[1.0 if x < 32 else 0.0 for x in range(64)]
                for _ in range(64)]
        out = post({**base, "init_image": init, "inpaint_mask": mask})
        assert len(out["images"]) == 1

        out = post({**base, "latent_preview": True})
        assert len(out["previews"]) == 2  # one gallery per step
        assert len(out["previews"][0]) == 1
    finally:
        server.shutdown()


def test_http_job_queue(manager):
    """Async job API: submit -> poll -> done matches the synchronous
    /generate result for the same seed; queued jobs can be cancelled;
    a running job with cancel_check_steps aborts at a chunk boundary."""
    import time as _time

    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, payload=None):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload or {}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    body = {"prompt": "a cat", "model": "tiny", "sampler": "Euler",
            "steps": 3, "width": 64, "height": 64, "seed": 21,
            "encoding_mode": "short"}
    try:
        sync = post("/generate", body)

        job = post("/jobs", body)
        assert job["status"] in ("queued", "running")
        jid = job["job_id"]
        for _ in range(600):
            st = get(f"/jobs/{jid}")
            if st["status"] in ("done", "error", "cancelled"):
                break
            _time.sleep(0.5)
        assert st["status"] == "done", st.get("error")
        assert st["progress"]["done"] == st["progress"]["total"]
        assert st["images"] == sync["images"]  # byte-identical PNGs
        assert jid in {j["job_id"] for j in get("/jobs")["jobs"]}

        # cancel while queued: enqueue two long jobs back-to-back; the
        # second is guaranteed still queued when we cancel it
        long_body = dict(body, steps=12, seed=1,
                         cancel_check_steps=1)
        j1 = post("/jobs", long_body)
        j2 = post("/jobs", dict(long_body, seed=2))
        c = post(f"/jobs/{j2['job_id']}/cancel")
        assert c["status"] == "cancelled"

        # cancel the running one mid-scan (chunk boundary re-entry)
        _time.sleep(0.2)
        post(f"/jobs/{j1['job_id']}/cancel")
        for _ in range(600):
            s1 = get(f"/jobs/{j1['job_id']}")
            if s1["status"] in ("done", "error", "cancelled"):
                break
            _time.sleep(0.5)
        # either it was aborted mid-run or it finished before the flag
        # was seen — both are valid terminal states, never "error"
        assert s1["status"] in ("cancelled", "done"), s1.get("error")

        # bad payloads are rejected at submit time
        try:
            post("/jobs", {"model": "tiny"})
            assert False, "missing prompt must 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown job id
        try:
            get("/jobs/job-99999")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_http_server_base64_image_inputs(manager):
    """Image-valued JSON fields accept base64 PNG strings: init_image
    (0..255), region masks (grayscale map, drawn = <255), and unit images
    ([0,1] after decode). Base64 and nested-list payloads must produce
    identical images for equivalent content."""
    import base64 as b64
    import io as _io

    from PIL import Image

    from diffusionspatialcontrol_tpu.app.server import serve

    def png_b64(arr):
        buf = _io.BytesIO()
        Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
        return b64.b64encode(buf.getvalue()).decode()

    server = serve(manager, port=0, block=False)
    try:
        port = server.server_address[1]

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        base = {
            "prompt": "a red cat", "model": "tiny", "sampler": "Euler",
            "steps": 2, "width": 64, "height": 64, "seed": 3,
            "encoding_mode": "short",
        }

        # init_image: base64 == nested lists (0..255)
        rng = np.random.RandomState(0)
        init_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        a = post({**base, "init_image": init_u8.tolist(),
                  "strength": 0.5})
        b = post({**base, "init_image": png_b64(init_u8),
                  "strength": 0.5})
        assert a["images"][0] == b["images"][0]

        # region mask: grayscale map (drawn = 0, background = 255)
        gray = np.full((64, 64), 255, np.uint8)
        gray[:, :32] = 0
        state_list = {"red cat": {
            "mask": [[1.0 if x < 32 else 0.0 for x in range(64)]
                     for _ in range(64)],
            "weight": 0.8, "mask_outsides": 0.2}}
        state_b64 = {"red cat": {"mask": png_b64(gray),
                                 "weight": 0.8, "mask_outsides": 0.2}}
        a = post({**base, "region_state": state_list})
        b = post({**base, "region_state": state_b64})
        assert a["images"][0] == b["images"][0]

        # ControlNet unit image: base64 (0..255 PNG) == lists in [0, 1]
        cond_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        unit_list = {"model": "Canny",
                     "image": (cond_u8 / 255.0).tolist()}
        unit_b64 = {"model": "Canny", "image": png_b64(cond_u8)}
        a = post({**base, "controlnet_units": [unit_list]})
        b = post({**base, "controlnet_units": [unit_b64]})
        assert a["images"][0] == b["images"][0]
    finally:
        server.shutdown()


def test_http_server_warmup(manager):
    from diffusionspatialcontrol_tpu.app.server import serve

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/warmup",
            data=json.dumps({"configs": [
                {"prompt": "warm", "model": "tiny", "sampler": "Euler",
                 "steps": 2, "width": 64, "height": 64,
                 "encoding_mode": "short"},
            ]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert len(payload["results"]) == 1
        assert payload["results"][0]["seconds"] > 0

        # unknown model -> 400 with the KeyError message
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/warmup",
            data=json.dumps({"model": "nope"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_http_server_grid_img2img(manager):
    """Server e2e: 2 prompts x 2 seeds with per-prompt base64 init images;
    each grid sample matches the equivalent single-run response byte for
    byte (per-seed invariance through the HTTP surface)."""
    import base64

    from diffusionspatialcontrol_tpu.app.server import serve
    from diffusionspatialcontrol_tpu.runtime import native

    rng = np.random.RandomState(21)
    imgs = [(rng.rand(64, 64, 3) * 255).astype(np.uint8) for _ in range(2)]
    b64 = [
        base64.b64encode(native.encode_png(im)).decode() for im in imgs
    ]

    server = serve(manager, port=0, block=False)
    port = server.server_address[1]

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    base = {
        "model": "tiny", "sampler": "Euler", "steps": 2, "width": 64,
        "height": 64, "strength": 0.6, "encoding_mode": "short",
    }
    def decode(s):
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(base64.b64decode(s)))
                          ).astype(int)

    try:
        grid = post({**base, "prompt": ["a red cat", "a blue dog"],
                     "seed": [3, 8], "init_image": b64})
        assert len(grid["images"]) == 4
        solo = post({**base, "prompt": "a blue dog", "seed": 3,
                     "init_image": b64[1]})
        # per-seed invariance: pixel-equal up to 1 uint8 count — under the
        # 8-virtual-device harness XLA:CPU partitions reductions
        # differently for the batch-4 vs batch-1 programs, which can move
        # a value across a rounding boundary (bitwise on a real device
        # count, and in the float32 inference-level test)
        d = np.abs(decode(grid["images"][2]) - decode(solo["images"][0]))
        assert d.max() <= 1, d.max()
        solo0 = post({**base, "prompt": "a red cat", "seed": 8,
                      "init_image": b64[0]})
        d = np.abs(decode(grid["images"][1]) - decode(solo0["images"][0]))
        assert d.max() <= 1, d.max()
    finally:
        server.shutdown()
