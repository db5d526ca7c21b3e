"""Tests for the viz/export layer: PLY, GLB, colorize, video fallback."""

import json
import struct

import numpy as np
import pytest

from aether_tpu.viz import (
    colorize_depth,
    depth_video_frames,
    predictions_to_glb,
    save_ply,
    save_video,
    write_ply,
)


def _parse_ply(path):
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii")
    n = int([ln for ln in header.splitlines() if ln.startswith("element vertex")][0]
            .split()[-1])
    dtype = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                      ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    body = np.frombuffer(data[header_end:], dtype=dtype, count=n)
    return header, body


def test_ply_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    cols = np.arange(30, dtype=np.uint8).reshape(10, 3)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, cols)
    header, body = _parse_ply(path)
    assert "format binary_little_endian" in header
    np.testing.assert_allclose(
        np.stack([body["x"], body["y"], body["z"]], -1), pts
    )
    np.testing.assert_array_equal(
        np.stack([body["red"], body["green"], body["blue"]], -1), cols
    )


def test_save_ply_downsample_and_mask(tmp_path):
    rng = np.random.default_rng(0)
    pointmap = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
    image = rng.uniform(0, 255, size=(2, 8, 12, 3))
    mask = np.zeros((2, 8, 12), bool)
    mask[:, :4] = True  # keep half the pixels
    path = str(tmp_path / "pm.ply")
    save_ply(pointmap, image, path, downsample=4, mask=mask)
    _, body = _parse_ply(path)
    assert len(body) == (2 * 4 * 12) // 4


def _parse_glb(data: bytes):
    magic, version, total = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    json_len, json_type = struct.unpack_from("<II", data, 12)
    assert json_type == 0x4E4F534A
    gltf = json.loads(data[20 : 20 + json_len])
    bin_off = 20 + json_len
    bin_len, bin_type = struct.unpack_from("<II", data, bin_off)
    assert bin_type == 0x004E4942
    blob = data[bin_off + 8 : bin_off + 8 + bin_len]
    assert gltf["buffers"][0]["byteLength"] == len(blob)
    return gltf, blob


def test_glb_structure_and_point_recovery():
    rng = np.random.default_rng(1)
    t, h, w = 2, 6, 8
    preds = {
        "world_points": rng.normal(size=(t, h, w, 3)).astype(np.float32),
        "images": rng.uniform(0, 1, size=(t, h, w, 3)),
        "depths": np.full((t, h, w), 2.0),
        "camera_poses": np.broadcast_to(np.eye(4), (t, 4, 4)).copy(),
    }
    builder = predictions_to_glb(preds, show_cam=True)
    gltf, blob = _parse_glb(builder.to_bytes())

    # 1 point cloud + t camera glyphs
    assert len(gltf["meshes"]) == 1 + t
    points_prim = gltf["meshes"][0]["primitives"][0]
    assert points_prim["mode"] == 0
    acc = gltf["accessors"][points_prim["attributes"]["POSITION"]]
    view = gltf["bufferViews"][acc["bufferView"]]
    pts = np.frombuffer(
        blob[view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
        np.float32,
    ).reshape(-1, 3)
    # constant depth 2.0 -> no edges, all in front of max_depth: all points kept
    assert pts.shape[0] == t * h * w
    np.testing.assert_allclose(pts, preds["world_points"].reshape(-1, 3))
    # accessor min/max must bound the data (required by spec for POSITION)
    np.testing.assert_allclose(acc["min"], pts.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(acc["max"], pts.max(axis=0), rtol=1e-6)
    # camera glyph: triangles with indices
    cam_prim = gltf["meshes"][1]["primitives"][0]
    assert cam_prim["mode"] == 4 and "indices" in cam_prim


def test_glb_viewer_contract():
    """The serve UI's WebGL viewer (apps/serve.py _INDEX_HTML showGLB) parses
    GLBs with a deliberately minimal reader; pin every assumption it makes so
    the writer can never drift out from under the browser code:

    - first mode-0 primitive across meshes is the point cloud
    - POSITION is componentType 5126 (f32) VEC3 with min/max (used to center
      the camera), COLOR_0 is 5121 (u8) VEC3 normalized
    - the JS reads ``count*3`` elements at ``bufferView.byteOffset +
      accessor.byteOffset`` with NO byteStride handling -> views must be
      tightly packed (no byteStride key)
    - single binary buffer (the JS keeps only the first BIN chunk)
    """
    rng = np.random.default_rng(7)
    t, h, w = 2, 5, 6
    preds = {
        "world_points": rng.normal(size=(t, h, w, 3)).astype(np.float32),
        "images": rng.uniform(0, 1, size=(t, h, w, 3)),
        "depths": np.full((t, h, w), 2.0),
        "camera_poses": np.broadcast_to(np.eye(4), (t, 4, 4)).copy(),
    }
    gltf, blob = _parse_glb(predictions_to_glb(preds, show_cam=True).to_bytes())

    assert len(gltf["buffers"]) == 1
    pts = next(
        pr for mesh in gltf["meshes"] for pr in mesh["primitives"]
        if pr.get("mode") == 0
    )

    def read(acc_index, np_dtype, component_type):
        acc = gltf["accessors"][acc_index]
        assert acc["componentType"] == component_type
        assert acc["type"] == "VEC3"
        bv = gltf["bufferViews"][acc["bufferView"]]
        assert "byteStride" not in bv  # JS reader assumes tight packing
        off = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        arr = np.frombuffer(blob, np_dtype, count=acc["count"] * 3, offset=off)
        return acc, arr.reshape(-1, 3)

    pacc, pos = read(pts["attributes"]["POSITION"], np.float32, 5126)
    cacc, col = read(pts["attributes"]["COLOR_0"], np.uint8, 5121)
    assert cacc.get("normalized") is True
    assert "min" in pacc and "max" in pacc  # viewer centers on (min+max)/2
    assert pacc["count"] == cacc["count"] == t * h * w
    np.testing.assert_allclose(pos, preds["world_points"].reshape(-1, 3))
    expected = np.clip(preds["images"].reshape(-1, 3) * 255, 0, 255)
    np.testing.assert_allclose(col, expected.round(), atol=1)


def test_glb_masks_far_and_edge_points(tmp_path):
    t, h, w = 1, 8, 8
    depths = np.full((t, h, w), 1.0)
    depths[:, :, 4:] = 200.0  # beyond max_depth=100
    preds = {
        "world_points": np.zeros((t, h, w, 3), np.float32),
        "images": np.zeros((t, h, w, 3)),
        "depths": depths,
        "camera_poses": np.broadcast_to(np.eye(4), (t, 4, 4)).copy(),
    }
    builder = predictions_to_glb(preds, show_cam=False)
    gltf, _ = _parse_glb(builder.to_bytes())
    n = gltf["accessors"][
        gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]
    ]["count"]
    assert n < t * h * w  # far points dropped
    path = tmp_path / "scene.glb"
    builder.write(str(path))
    assert path.stat().st_size > 12


def test_colorize_depth_range():
    depth = np.array([[0.5, 1.0], [2.0, 0.0]])  # one invalid (0) pixel
    rgb = colorize_depth(depth)
    assert rgb.shape == (2, 2, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    frames = depth_video_frames(np.stack([depth, depth]))
    assert frames.shape == (2, 2, 2, 3) and frames.dtype == np.uint8


def test_save_video_fallback(tmp_path):
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    out = save_video(tmp_path / "clip.mp4", frames, fps=12)
    # mp4 backend missing in this image -> falls back, but something is written
    import os

    assert os.path.exists(out)


def test_mjpeg_avi_roundtrip(tmp_path):
    """The AVI muxer must produce a parseable RIFF whose JPEG frames decode
    back to the input within JPEG tolerance."""
    import io
    import struct

    from PIL import Image

    from aether_tpu.viz.video import write_mjpeg_avi

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(4, 4, 6, 3))
    frames = np.repeat(np.repeat(base, 8, 1), 8, 2).astype(np.uint8)  # smooth
    path = write_mjpeg_avi(tmp_path / "clip.avi", frames, fps=12)
    data = open(path, "rb").read()

    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8

    # walk top-level chunks, collect the movi frames and the index
    pos, jpegs, idx_count = 12, [], 0
    while pos < len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        if fourcc == b"LIST" and payload[:4] == b"movi":
            mp = 4
            while mp < len(payload):
                csize = struct.unpack("<I", payload[mp + 4:mp + 8])[0]
                assert payload[mp:mp + 4] == b"00dc"
                jpegs.append(payload[mp + 8:mp + 8 + csize])
                mp += 8 + csize + (csize % 2)
        elif fourcc == b"idx1":
            idx_count = size // 16
        pos += 8 + size + (size % 2)

    assert len(jpegs) == frames.shape[0] and idx_count == frames.shape[0]
    decoded = np.asarray(Image.open(io.BytesIO(jpegs[0])))
    assert decoded.shape == frames[0].shape
    assert np.mean(np.abs(decoded.astype(np.float32)
                          - frames[0].astype(np.float32))) < 12.0


def test_mjpeg_mp4_roundtrip(tmp_path):
    """The MP4 muxer must produce valid ISO BMFF: well-formed box tree,
    sample table consistent with the mdat payload, JPEG samples that decode
    back to the input within JPEG tolerance."""
    import io
    import struct

    from PIL import Image

    from aether_tpu.viz.video import write_mjpeg_mp4

    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, size=(5, 4, 6, 3))
    frames = np.repeat(np.repeat(base, 8, 1), 8, 2).astype(np.uint8)  # smooth
    path = write_mjpeg_mp4(tmp_path / "clip.mp4", frames, fps=12)
    data = open(path, "rb").read()

    def boxes(buf, pos=0, end=None):
        end = len(buf) if end is None else end
        out = []
        while pos < end:
            size = struct.unpack(">I", buf[pos:pos + 4])[0]
            assert size >= 8
            out.append((buf[pos + 4:pos + 8], pos + 8, pos + size))
            pos += size
        assert pos == end  # boxes tile the span exactly
        return out

    top = {name: (s, e) for name, s, e in boxes(data)}
    assert set(top) == {b"ftyp", b"mdat", b"moov"}
    assert data[top[b"ftyp"][0]:top[b"ftyp"][0] + 4] == b"isom"

    # walk moov -> trak -> mdia -> minf -> stbl
    def child(buf, span, name):
        for n, s, e in boxes(buf, *span):
            if n == name:
                return (s, e)
        raise AssertionError(f"missing {name}")

    # mvhd: spec-exact ISO 14496-12 v0 layout (100-byte payload; matrix at
    # +36 starting 0x00010000) — a 2-byte reserved-field slip shifts the
    # movie matrix and next_track_ID for every positional parser
    mvhd_s, mvhd_e = child(data, top[b"moov"], b"mvhd")
    assert mvhd_e - mvhd_s == 100
    assert struct.unpack(">i", data[mvhd_s + 36:mvhd_s + 40])[0] == 0x00010000
    assert struct.unpack(">I", data[mvhd_e - 4:mvhd_e])[0] == 2  # next track

    trak = child(data, top[b"moov"], b"trak")
    mdia = child(data, trak, b"mdia")
    minf = child(data, mdia, b"minf")
    stbl = child(data, minf, b"stbl")
    mdhd_s, _ = child(data, mdia, b"mdhd")
    timescale, dur = struct.unpack(">II", data[mdhd_s + 12:mdhd_s + 20])
    assert timescale == 12 and dur == frames.shape[0]

    # stsd: one mp4v entry whose esds declares OTI 0x6C (JPEG)
    stsd_s, stsd_e = child(data, stbl, b"stsd")
    entry = boxes(data, stsd_s + 8, stsd_e)[0]
    assert entry[0] == b"mp4v"
    assert b"\x04" in data[entry[1]:entry[2]]  # DecoderConfigDescriptor
    esds = child(data, (entry[1] + 78, entry[2]), b"esds")
    oti = data[data.index(b"\x04", esds[0]) + 2]
    assert oti == 0x6C

    # sample table -> recover samples from mdat and decode
    stsz_s, _ = child(data, stbl, b"stsz")
    count = struct.unpack(">I", data[stsz_s + 8:stsz_s + 12])[0]
    assert count == frames.shape[0]
    sizes = struct.unpack(f">{count}I",
                          data[stsz_s + 12:stsz_s + 12 + 4 * count])
    stco_s, _ = child(data, stbl, b"stco")
    offset = struct.unpack(">I", data[stco_s + 8:stco_s + 12])[0]
    assert offset == top[b"mdat"][0]  # one chunk at mdat payload start
    assert sum(sizes) == top[b"mdat"][1] - top[b"mdat"][0]

    pos = offset
    for i, size in enumerate(sizes):
        decoded = np.asarray(Image.open(io.BytesIO(data[pos:pos + size])))
        assert decoded.shape == frames[i].shape
        assert np.mean(np.abs(decoded.astype(np.float32)
                              - frames[i].astype(np.float32))) < 12.0
        pos += size


def test_save_video_mp4_keeps_extension(tmp_path):
    """A .mp4 request must yield a .mp4 file even without ffmpeg (the
    MJPEG-in-MP4 fallback) — never a renamed .avi."""
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    out = save_video(tmp_path / "clip.mp4", frames, fps=12)
    assert out.endswith(".mp4")
    data = open(out, "rb").read()
    assert data[4:8] == b"ftyp"
