"""Observability tests: TensorBoard event-file writer (runtime/tb.py)
round-trips through a minimal TFRecord/protobuf parser."""
import struct

from thormang_isaacgym_tpu.runtime.tb import SummaryWriter, _masked_crc


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            out.append(payload)


def _parse_varint(buf, i):
    shift, val = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_fields(buf):
    """(field_num -> list of raw payloads) for one protobuf message."""
    i, out = 0, {}
    while i < len(buf):
        key, i = _parse_varint(buf, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _parse_varint(buf, i)
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _parse_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(wire)
        out.setdefault(num, []).append(v)
    return out


def test_tb_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("reward/mean", 1.5, 10)
    w.add_scalar("loss", -0.25, 11)
    w.add_scalars({"a": 2.0, "skip": "str"}, 12, prefix="env/")
    w.close()
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    records = _read_records(files[0])
    # record 0 is the file-version header
    assert b"brain.Event:2" in records[0]
    seen = {}
    for rec in records[1:]:
        ev = _parse_fields(rec)
        step = ev[2][0] if 2 in ev else 0   # wire-0 fields parse to ints
        summary = _parse_fields(ev[5][0])
        val = _parse_fields(summary[1][0])
        tag = val[1][0].decode()
        (x,) = struct.unpack("<f", val[2][0])
        seen[tag] = (step, x)
    assert seen["reward/mean"] == (10, 1.5)
    assert seen["loss"][1] == -0.25
    assert seen["env/a"] == (12, 2.0)
    assert "env/skip" not in seen


def test_replay_logger_and_html(tmp_path):
    """StateLogger + render_html (the N7 viewer replacement,
    SURVEY.md §2.1): logs q frames, renders a standalone HTML replay."""
    import jax
    import jax.numpy as jnp

    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.runtime.replay import StateLogger, render_html

    env = tgx.make("Cartpole", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    log = StateLogger(env.task.model, dt=env.task.sim_params.dt)
    for _ in range(5):
        state = env.step(state, jnp.zeros((2, 1)))
        log.add(state.q[0])
    assert len(log) == 5
    npz = tmp_path / "traj.npz"
    log.save(str(npz))
    log2 = StateLogger.load(env.task.model, str(npz))
    assert len(log2) == 5
    html = tmp_path / "traj.html"
    render_html(log2, str(html))
    text = html.read_text()
    assert "<canvas" in text and "const F=[[" in text
    # one entry per geom per frame
    import json as _json
    data = _json.loads(text.split("const F=")[1].split(", dt=")[0])
    assert len(data) == 5
    assert len(data[0]) == env.task.model.ng


def test_render_video_gif(tmp_path):
    """render_video (RecordVideo equivalent, train.py:114-121): a logged
    rollout renders to an animated GIF."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.runtime.replay import StateLogger, render_video

    env = tgx.make("Cartpole", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    log = StateLogger(env.task.model, dt=1 / 60)
    for _ in range(12):
        state = env.step(state, jnp.zeros((2, 1)))
        log.add(np.asarray(state.q[0]))
    path = str(tmp_path / "roll.gif")
    render_video(log, path, every=2)
    import os
    assert os.path.getsize(path) > 1000
    from PIL import Image
    im = Image.open(path)
    assert getattr(im, "n_frames", 1) >= 2


def test_live_viewer_http_and_events():
    """Live viewer (reference vec_task.py:408-440 equivalent): serves the
    page and state over localhost HTTP, forwards only subscribed keys as
    (action, key) events, V toggles frame sync, ESC closes the loop."""
    import json as _json
    import urllib.request

    import jax
    import jax.numpy as jnp

    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.runtime.viewer import LiveViewer, ViewerClosed

    env = tgx.make("Cartpole", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    viewer = LiveViewer(env, announce=False)
    viewer.enable_viewer_sync = False       # no real-time throttle in CI
    try:
        viewer.subscribe_keyboard_event("r", "reset")
        viewer.add_debug_line((0, 0, 0), (1, 0, 1))
        viewer.render(state)

        page = urllib.request.urlopen(viewer.url, timeout=5).read()
        assert b"canvas" in page
        st = _json.loads(urllib.request.urlopen(
            viewer.url + "state", timeout=5).read())
        assert len(st["geoms"]) > 0 and not st["sync"]

        def press(key):
            req = urllib.request.Request(
                viewer.url + "key", data=_json.dumps({"key": key}).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=5)

        press("r")          # subscribed -> event
        press("x")          # unsubscribed -> dropped
        press("v")          # toggles sync
        # 'v' is a default subscription (the reference's
        # toggle_viewer_sync action), so it reports alongside 'r'
        assert viewer.query_events() == [("reset", "r"),
                                         ("toggle_viewer_sync", "v")]
        assert viewer.query_events() == []          # drained
        assert viewer.enable_viewer_sync            # V toggled it back on
        viewer.enable_viewer_sync = False

        press("Escape")
        try:
            viewer.render(state)
            raise AssertionError("ESC must close the viewer loop")
        except ViewerClosed:
            pass
    finally:
        viewer.close()
