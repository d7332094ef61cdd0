"""Minimal JSON HTTP serving layer.

The reference ships a Gradio Blocks app (source/app.py:2171-3063). Gradio is
not available in this environment, so the serving layer is a stdlib HTTP
server exposing the same operations as JSON endpoints; a Gradio front-end
can be layered on ``app.api.inference`` when the dependency exists (guarded
import in ``launch_gradio``).

Endpoints:
  POST /generate   — inference() parameters as JSON (images base64 PNG-less
                     raw arrays for zero-dependency transport)
  GET  /models     — registered checkpoints
  GET  /samplers   — sampler registry names
  GET  /health
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .. import registry
from .api import ModelManager, inference


def _encode_images(images: np.ndarray):
    """base64 PNG per image (native C++ encoder when available)."""
    from ..runtime import native

    return [
        base64.b64encode(native.encode_png(img)).decode() for img in images
    ]


class _Handler(BaseHTTPRequestHandler):
    manager: ModelManager = None  # set by serve()
    lock = threading.Lock()  # serialize generations (reference: gradio queue)

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path == "/health":
            self._json(200, {"ok": True})
        elif self.path == "/models":
            self._json(200, {"models": sorted(self.manager._dirs)})
        elif self.path == "/samplers":
            self._json(200, {"samplers": sorted(registry.SAMPLERS)})
        elif self.path == "/preprocessors":
            from ..ops import preprocess as pp

            self._json(200, {
                "pure_image": sorted(pp.NATIVE_PREPROCESSORS),
                "model_based_native": list(pp.NATIVE_MODEL_PREPROCESSORS),
                "model_based_unavailable": [
                    n for n in pp.MODEL_BASED_PREPROCESSORS
                    if n not in pp.NATIVE_MODEL_PREPROCESSORS
                ],
            })
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path == "/preprocess":
            # run a named control preprocessor standalone (the reference
            # preprocesses inside inference, app.py:924-997; exposing it
            # lets clients inspect/edit control images)
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                img = np.asarray(req["image"], np.float32)
                fn = self.manager.get_preprocessor(req["preprocessor"])
                with self.lock:
                    out = fn(img)
                self._json(200, {"image": _encode_images(
                    np.round(np.asarray(out) * 255).astype(np.uint8)[None]
                )[0]})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        if self.path != "/generate":
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            def _parse_state(state):
                if not state:
                    return None
                return {
                    phrase: {
                        "mask": np.asarray(spec["mask"], np.float32),
                        "weight": float(spec.get("weight", 1.0)),
                        "mask_outsides": float(
                            spec.get("mask_outsides", 0.0)
                        ),
                    }
                    for phrase, spec in state.items()
                }

            raw_state = req.get("region_state")
            if isinstance(raw_state, list):
                # multi-prompt batch: one region dict (or null) per prompt
                region_state = [_parse_state(s) for s in raw_state]
            else:
                region_state = _parse_state(raw_state)
            kwargs = {
                k: req[k]
                for k in (
                    "neg_prompt", "sampler", "steps", "cfg_scale", "width",
                    "height", "seed", "num_images_per_prompt", "clip_skip",
                    "encoding_mode", "guidance_rescale", "strength",
                    "hires_scale", "hires_strength", "hires_mode",
                    "hires_steps", "eta", "cancel_check_steps", "timeout",
                    "latent_preview", "cfg_tail_frac",
                )
                if k in req
            }

            def _img(v):
                return None if v is None else np.asarray(v, np.float32)

            if req.get("init_image") is not None:
                arr = np.asarray(req["init_image"], np.float32)
                # JSON images arrive as 0..255 lists; inference's _to_pm1
                # keys the convention off uint8 dtype
                kwargs["init_image"] = (
                    arr.astype(np.uint8) if arr.max() > 1.5 else arr
                )
            if req.get("inpaint_mask") is not None:
                kwargs["inpaint_mask"] = np.asarray(req["inpaint_mask"],
                                                    np.float32)

            if req.get("loras"):
                kwargs["loras"] = [
                    (u, 1.0) if isinstance(u, str) else (u[0], float(u[1]))
                    for u in req["loras"]
                ]
            if req.get("ti_embeddings"):
                kwargs["ti_embeddings"] = list(req["ti_embeddings"])
            if req.get("controlnet_units"):
                from .api import ControlNetUnit

                kwargs["controlnet_units"] = [
                    ControlNetUnit(
                        model=u["model"], image=_img(u["image"]),
                        scale=float(u.get("scale", 1.0)),
                        guidance_start=float(u.get("guidance_start", 0.0)),
                        guidance_end=float(u.get("guidance_end", 1.0)),
                        guess_mode=bool(u.get("guess_mode", False)),
                        preprocessor=u.get("preprocessor"),
                    )
                    for u in req["controlnet_units"]
                ]
            if req.get("t2i_units"):
                from .api import T2IAdapterUnit

                kwargs["t2i_units"] = [
                    T2IAdapterUnit(
                        model=u["model"], image=_img(u["image"]),
                        scale=float(u.get("scale", 1.0)),
                        preprocessor=u.get("preprocessor"),
                        conditioning_factor=float(
                            u.get("conditioning_factor", 1.0)
                        ),
                    )
                    for u in req["t2i_units"]
                ]
            if req.get("ip_adapter_units"):
                from .api import IPAdapterUnit

                kwargs["ip_adapter_units"] = [
                    IPAdapterUnit(
                        model=u["model"], image=_img(u.get("image")),
                        image_embeds=_img(u.get("image_embeds")),
                        scale=float(u.get("scale", 1.0)),
                        mask=_img(u.get("mask")),
                    )
                    for u in req["ip_adapter_units"]
                ]
            with self.lock:
                result = inference(
                    self.manager,
                    prompt=req["prompt"],
                    model=req["model"],
                    region_state=region_state,
                    **kwargs,
                )
            payload = {
                "images": _encode_images(result["images"]),
                "timings": result["timings"],
            }
            if result.get("previews") is not None:
                # per-step galleries; spans base + hires passes
                payload["previews"] = [
                    _encode_images(p) for p in result["previews"]
                ]
            self._json(200, payload)
        except Exception as e:  # noqa: BLE001 - report to client
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


def serve(manager: ModelManager, host: str = "127.0.0.1", port: int = 7860,
          block: bool = True) -> Optional[ThreadingHTTPServer]:
    handler = type("Handler", (_Handler,), {"manager": manager})
    server = ThreadingHTTPServer((host, port), handler)
    if block:
        server.serve_forever()
        return None
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def launch_gradio(manager: ModelManager, **kwargs):  # pragma: no cover
    """Gradio front-end when the dependency is available."""
    try:
        import gradio  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; use app.server.serve (JSON HTTP) "
            "instead"
        ) from e
    from .gradio_ui import launch

    return launch(manager, **kwargs)
