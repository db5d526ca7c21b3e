"""End-to-end web app test: HTTP submit -> staged progress -> artifacts.

Capability parity checks vs the reference gradio app (SURVEY.md L4,
``scripts/demo_gradio.py``): three tasks behind a bounded queue, staged
progress surfaced while running (gr.Progress analogue), downloadable
artifacts, and per-frame GLB point clouds consumable by the embedded WebGL
viewer (whose data contract — mode-0 POINTS primitive, f32 POSITION with
min/max, normalized u8 COLOR_0 — is asserted here).
"""

import io
import json
import struct
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aether_tpu.config import PipelineConfig
from aether_tpu.models import init_dit_params, init_vae_params
from aether_tpu.pipeline import AetherPipeline


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    from types import SimpleNamespace

    from http.server import ThreadingHTTPServer

    from aether_tpu.apps.serve import JobRunner, make_handler

    cfg = PipelineConfig.tiny()
    key = jax.random.PRNGKey(0)
    pipe = AetherPipeline(
        cfg, init_dit_params(key, cfg.dit),
        init_vae_params(jax.random.fold_in(key, 1), cfg.vae),
        np.zeros((1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim),
                 np.float32),
        compute_dtype=jnp.float32,
    )
    out_dir = str(tmp_path_factory.mktemp("serve_out"))
    runner = JobRunner(pipe, out_dir)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(runner, None))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield SimpleNamespace(url=f"http://127.0.0.1:{httpd.server_address[1]}",
                          runner=runner, pipeline=pipe)
    httpd.shutdown()


@pytest.fixture(scope="module")
def server(stack):
    return stack.url


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _submit_multipart(url, fields, files):
    boundary = "testboundary123"
    body = io.BytesIO()
    for name, value in fields.items():
        body.write(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f"name=\"{name}\"\r\n\r\n{value}\r\n".encode())
    for name, (filename, data) in files.items():
        body.write(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f"name=\"{name}\"; filename=\"{filename}\"\r\n"
            f"Content-Type: application/octet-stream\r\n\r\n".encode())
        body.write(data)
        body.write(b"\r\n")
    body.write(f"--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        url, data=body.getvalue(),
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _gif_bytes(frames=17, h=64, w=96):
    from PIL import Image

    x = np.broadcast_to(np.linspace(0, 255, w)[None, :], (h, w))
    y = np.broadcast_to(np.linspace(0, 255, h)[:, None], (h, w))
    imgs = [
        Image.fromarray(
            np.stack([x, y, np.full((h, w), 40 + t * 10)], -1).astype(np.uint8)
        )
        for t in range(frames)
    ]
    buf = io.BytesIO()
    imgs[0].save(buf, format="GIF", save_all=True, append_images=imgs[1:],
                 duration=80, loop=0)
    return buf.getvalue()


def test_index_and_raymaps(server):
    html = _get(server + "/").decode()
    assert "viewer" in html and "showGLB" in html  # embedded 3D viewer
    # no --raymap_dir: generated camera actions are offered instead of
    # canned .npy blobs (reference ships example_raymaps/*.npy)
    from aether_tpu.apps.actions import NAMED_ACTIONS

    assert json.loads(_get(server + "/api/raymaps")) == sorted(NAMED_ACTIONS)


def test_prediction_job_with_generated_raymap(server):
    """Prediction task via a generated raymap action (no canned .npy dir)."""
    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(2).uniform(0, 255, (64, 96, 3))).astype("uint8")
    ).save(buf, format="PNG")
    resp = _submit_multipart(
        server + "/api/submit",
        {"task": "prediction", "num_frames": "17", "fps": "12",
         "steps": "1", "height": "64", "width": "96", "raymap": "forward"},
        {"image": ("obs.png", buf.getvalue())},
    )
    job_id = resp["job_id"]
    for _ in range(300):
        status = json.loads(_get(f"{server}/api/status/{job_id}"))
        if status["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert status["status"] == "done", status.get("error")
    assert any(a.endswith(".glb") for a in status["artifacts"])


def test_prediction_advanced_options(server):
    """Advanced form fields (reference demo_gradio's seed / dynamic-CFG /
    post-reconstruction / smoothing / GLB-interval controls): a prediction
    with post_reconstruction=no must use the prediction's own disparity and
    raymap instead of the 4-step refinement pass."""
    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(5).uniform(0, 255, (64, 96, 3))).astype("uint8")
    ).save(buf, format="PNG")
    resp = _submit_multipart(
        server + "/api/submit",
        {"task": "prediction", "num_frames": "17", "fps": "12",
         "steps": "1", "height": "64", "width": "96", "raymap": "forward",
         "seed": "7", "dynamic_cfg": "off", "post_reconstruction": "no",
         "smooth_camera": "no", "align_pointmaps": "yes",
         "pc_interval": "5", "max_depth": "50", "rtol": "0.1"},
        {"image": ("obs.png", buf.getvalue())},
    )
    job_id = resp["job_id"]
    for _ in range(300):
        status = json.loads(_get(f"{server}/api/status/{job_id}"))
        if status["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert status["status"] == "done", status.get("error")
    stages = [s["stage"] for s in status["progress"]["stages_done"]]
    # post_reconstruction=no: exactly one sampling pass ran (no second
    # 4-step reconstruction stage group)
    assert sum(s == "denoise" for s in stages) == 1, stages
    assert any(a.endswith(".glb") for a in status["artifacts"])


def test_reconstruction_job_with_progress_and_glb(server):
    resp = _submit_multipart(
        server + "/api/submit",
        {"task": "reconstruction", "num_frames": "17", "fps": "12",
         "steps": "1", "stride": "24", "height": "64", "width": "96"},
        {"video": ("input.gif", _gif_bytes())},
    )
    job_id = resp["job_id"]

    saw_stage = False
    for _ in range(240):
        status = json.loads(_get(f"{server}/api/status/{job_id}"))
        prog = status.get("progress") or {}
        if prog.get("stage") or prog.get("detail"):
            saw_stage = True
        if status["status"] in ("done", "error"):
            break
        time.sleep(1)
    assert status["status"] == "done", status.get("error")
    assert saw_stage, "no staged progress was ever surfaced"
    done_stages = {d["stage"] for d in prog.get("stages_done", [])}
    assert {"vae_encode", "denoise", "vae_decode"} <= done_stages, done_stages

    glbs = [a for a in status["artifacts"] if a.endswith(".glb")]
    assert glbs, status["artifacts"]

    # viewer data contract: GLB magic, JSON+BIN chunks, POINTS primitive with
    # f32 POSITION (min/max present) and normalized u8 COLOR_0
    buf = _get(server + glbs[0])
    assert struct.unpack_from("<I", buf, 0)[0] == 0x46546C67
    off, js, binchunk = 12, None, None
    while off < len(buf):
        ln, typ = struct.unpack_from("<II", buf, off)
        data = buf[off + 8 : off + 8 + ln]
        if typ == 0x4E4F534A:
            js = json.loads(data)
        elif typ == 0x004E4942:
            binchunk = data
        off += 8 + ln
    points = [pr for mesh in js["meshes"] for pr in mesh["primitives"]
              if pr.get("mode") == 0]
    assert points, "no POINTS primitive for the viewer"
    pa = js["accessors"][points[0]["attributes"]["POSITION"]]
    ca = js["accessors"][points[0]["attributes"]["COLOR_0"]]
    assert pa["componentType"] == 5126 and "min" in pa and "max" in pa
    assert ca["componentType"] == 5121 and ca.get("normalized") is True
    assert binchunk is not None and pa["count"] == ca["count"] > 0


def test_queue_rejects_when_full(server):
    from aether_tpu.apps.serve import JobRunner

    class _NeverRun(JobRunner):
        def _worker(self):  # block forever: jobs stay queued
            while True:
                time.sleep(3600)

    runner = _NeverRun(pipeline=None, output_dir="/tmp", max_queue=2)
    runner.submit({"task": "reconstruction"})
    runner.submit({"task": "reconstruction"})
    import queue as _q

    with pytest.raises(_q.Full):
        runner.submit({"task": "reconstruction"})


def test_stats_endpoint_reports_queue_and_stages(server):
    stats = json.loads(_get(server + "/api/stats"))
    assert isinstance(stats["queue_depth"], int)
    assert isinstance(stats["jobs"], dict)
    assert isinstance(stats["stages"], dict)
    # earlier tests in this module ran full jobs through this server, so the
    # pipeline stages must have accumulated wall-clock here
    if stats["jobs"].get("done"):
        assert "denoise" in stats["stages"]
        assert stats["stages"]["denoise"]["count"] >= 1


def test_warmup_precompiles_named_tasks(stack):
    """serve --warmup runs each task once on zeros so the per-(task, steps,
    shape) jit graphs exist before the first request."""
    from aether_tpu.apps.serve import warmup
    from aether_tpu.utils.profiling import stage_report

    warmup(stack.pipeline, ["prediction", "reconstruction"], num_frames=17,
           height=64, width=96, steps=1)
    report = stage_report()
    assert report["warmup/prediction"]["count"] >= 1
    assert report["warmup/reconstruction"]["count"] >= 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        warmup(stack.pipeline, ["bogus"], num_frames=17, height=64, width=96)


def test_oversized_upload_rejected(server, monkeypatch):
    import urllib.error

    from aether_tpu.apps import serve as serve_mod

    monkeypatch.setattr(serve_mod, "MAX_UPLOAD_BYTES", 1000)
    with pytest.raises(urllib.error.HTTPError) as err:
        _submit_multipart(
            server + "/api/submit",
            {"task": "prediction", "num_frames": "17"},
            {"image": ("big.png", b"x" * 5000)},
        )
    assert err.value.code == 400
    assert "too large" in json.loads(err.value.read())["error"]
