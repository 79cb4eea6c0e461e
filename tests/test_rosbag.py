"""Rosbag v2.0 ingestion: round-trip, compression, channel fallbacks, and the
sweeplog conversion path (VERDICT r1 item 1 — the reference's front door is
bag replay, README.md:40-52)."""
import numpy as np
import pytest

from rgc_slam_tpu.io import rosbag as rb


def _make_scan(rng, n=500):
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, n).astype(np.float32)
    ring = rng.integers(0, 16, n).astype(np.uint16)
    rel = np.linspace(0, 0.999, n).astype(np.float32)
    return xyz, inten, ring, rel


def _write_bag(path, rng, n_scans=4, hz_imu=100, compression="none",
               with_ring=True, with_time=True):
    with rb.BagWriter(path, chunk_size=3, compression=compression) as w:
        t0 = 1700000000.0
        for k in range(n_scans):
            stamp = t0 + 0.1 * (k + 1)
            # IMU packets in (prev, stamp]
            for j in range(int(0.1 * hz_imu)):
                ts = stamp - 0.1 + (j + 1) / hz_imu
                w.write("/mynteye/imu/data_raw", "sensor_msgs/Imu", ts,
                        rb.encode_imu(ts, [0.01 * k, 0.0, 9.81], [0.0, 0.0, 0.02]))
            xyz, inten, ring, rel = _make_scan(rng)
            w.write(
                "/velodyne_points", "sensor_msgs/PointCloud2", stamp,
                rb.encode_pointcloud2(
                    stamp, xyz, inten,
                    ring if with_ring else None,
                    rel if with_time else None,
                ),
            )
    return t0


def test_bag_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.bag")
    rng2 = np.random.default_rng(1)
    t0 = _write_bag(path, rng2)
    rng2 = np.random.default_rng(1)
    scans = list(rb.scan_stream(path))
    assert len(scans) == 4
    for k, s in enumerate(scans):
        xyz, inten, ring, rel = _make_scan(rng2)
        np.testing.assert_allclose(s["xyz"], xyz, rtol=1e-6)
        np.testing.assert_allclose(s["intensity"], inten, rtol=1e-6)
        np.testing.assert_array_equal(s["ring"], ring)
        np.testing.assert_allclose(s["rel_time"], rel, atol=2e-3)
        assert abs(s["stamp"] - (t0 + 0.1 * (k + 1))) < 1e-6
        # 10 IMU samples per interval, time-ordered, inside (prev, stamp]
        assert len(s["imu_t"]) == 10
        assert (np.diff(s["imu_t"]) > 0).all()
        assert (s["imu_t"] <= s["stamp"] + 1e-9).all()
        np.testing.assert_allclose(s["imu_acc"][:, 2], 9.81)
        np.testing.assert_allclose(s["imu_gyr"][:, 2], 0.02)


def test_bag_bz2_chunks(tmp_path):
    path = str(tmp_path / "c.bag")
    rng2 = np.random.default_rng(2)
    _write_bag(path, rng2, compression="bz2")
    scans = list(rb.scan_stream(path))
    assert len(scans) == 4
    assert len(scans[0]["xyz"]) == 500


def test_bag_channel_fallbacks(tmp_path):
    """No ring/time channels: the vertical-angle and azimuth formulas of
    scanRegistration.cpp:115-231 fill them in."""
    path = str(tmp_path / "f.bag")
    rng2 = np.random.default_rng(3)
    _write_bag(path, rng2, with_ring=False, with_time=False)
    scans = list(rb.scan_stream(path, n_scans_sensor=16))
    s = scans[0]
    assert len(s["xyz"]) > 0                       # out-of-fov points culled
    assert s["ring"].min() >= 0 and s["ring"].max() < 16
    # reference relTime is only bounded by (-0.5, 1.5) (the cpp:206 comment):
    # this fixture's points are not sweep-ordered, so the halfPassed
    # unwrapping legitimately leaves [0, 1] — exactly what the C++ produces
    # on the same unordered input (rel_time_from_azimuth is oracle-exact,
    # tests/test_parity_oracles.py)
    assert (s["rel_time"] > -0.5).all() and (s["rel_time"] < 1.5).all()


def test_bag_header_indexed(tmp_path):
    """The writer back-patches a real bag header with index_pos/conn/chunk
    counts (ROS tooling compatibility)."""
    import struct

    path = str(tmp_path / "h.bag")
    rng2 = np.random.default_rng(4)
    _write_bag(path, rng2)
    with open(path, "rb") as f:
        assert f.read(13) == b"#ROSBAG V2.0\n"
        (hlen,) = struct.unpack("<I", f.read(4))
        fields = rb._parse_header(f.read(hlen))
        assert fields[b"op"][0] == rb.OP_BAGHDR
        (index_pos,) = struct.unpack("<Q", fields[b"index_pos"])
        assert index_pos > 0
        assert struct.unpack("<I", fields[b"conn_count"])[0] == 2
        assert struct.unpack("<I", fields[b"chunk_count"])[0] >= 2


def test_bag_to_sweeplog(tmp_path):
    path = str(tmp_path / "s.bag")
    rng2 = np.random.default_rng(5)
    _write_bag(path, rng2)
    out = str(tmp_path / "s.slog")
    n = rb.bag_to_sweeplog(path, out)
    assert n == 4
    from rgc_slam_tpu.runtime.loader import SweepLogReader

    with SweepLogReader(out, pad_points=1024, pad_imu=32) as r:
        got = list(r)
    assert len(got) == 4
    assert got[0]["mask"].sum() == 500
    assert got[0]["imu_mask"].sum() == 10


def test_navsatfix_decode():
    raw = rb.encode_imu(1.0, [0, 0, 9.81], [0, 0, 0])  # wrong type on purpose
    # build a real NavSatFix: header + status(int8+u16) + 3 f64 + 9 f64 + u8
    import struct

    frame = b"gps"
    msg = struct.pack("<IIII", 0, 5, 500000000, len(frame)) + frame
    msg += struct.pack("<bH", 0, 1)
    msg += struct.pack("<ddd", 31.5, 120.25, 12.0)
    msg += np.zeros(9, np.float64).tobytes() + b"\x00"
    d = rb.read_navsatfix(msg)
    assert abs(d["stamp"] - 5.5) < 1e-9
    assert d["lat"] == 31.5 and d["lon"] == 120.25 and d["alt"] == 12.0
    del raw


def test_ring_exceeding_config_raises(tmp_path, rng):
    """A 32-ring bag against a 16-scan config must fail loudly (VERDICT r2
    review: silently clipped rings corrupt the organize bookkeeping)."""
    path = str(tmp_path / "r32.bag")
    with rb.BagWriter(path) as w:
        xyz = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
        ring = rng.integers(0, 32, 100).astype(np.uint16)
        ring[0] = 31
        w.write("/velodyne_points", "sensor_msgs/PointCloud2", 1.0,
                rb.encode_pointcloud2(1.0, xyz, None, ring, None))
    with pytest.raises(ValueError, match="ring channel"):
        list(rb.scan_stream(path, n_scans_sensor=16))


def test_index_offsets_point_at_messages(tmp_path, rng):
    """IndexData offsets must be each message's byte position in the
    uncompressed chunk (standard rosbag readers seek by them)."""
    path = str(tmp_path / "ix.bag")
    _write_bag(path, np.random.default_rng(3), n_scans=4)
    # collect (chunk payload, index entries) pairs by re-parsing records
    with open(path, "rb") as f:
        assert f.readline() == b"#ROSBAG V2.0\n"
        data = f.read()
    pos, chunks, indexes = 0, [], []
    while pos < len(data):
        hlen = int.from_bytes(data[pos:pos + 4], "little"); pos += 4
        hdr = rb._parse_header(data[pos:pos + hlen]); pos += hlen
        dlen = int.from_bytes(data[pos:pos + 4], "little"); pos += 4
        payload = data[pos:pos + dlen]; pos += dlen
        op = hdr[b"op"][0]
        if op == 0x05:                                     # chunk
            if hdr[b"compression"] == b"bz2":
                import bz2
                payload = bz2.decompress(payload)
            chunks.append(payload)
        elif op == 0x04:                                   # index
            n = int.from_bytes(hdr[b"count"], "little")
            offs = [int.from_bytes(payload[12 * i + 8:12 * i + 12], "little")
                    for i in range(n)]
            indexes.append((len(chunks) - 1, offs))
    assert chunks and indexes
    nonzero = 0
    for ci, offs in indexes:
        chunk = chunks[ci]
        for o in offs:
            # the record at offset o must be a message-data record (op=0x02)
            hlen = int.from_bytes(chunk[o:o + 4], "little")
            rec_hdr = rb._parse_header(chunk[o + 4:o + 4 + hlen])
            assert rec_hdr[b"op"][0] == 0x02, f"offset {o} not a message"
            nonzero += int(o > 0)
    assert nonzero > 0, "all offsets zero — index is degenerate"


def test_ring32_with_matching_config(tmp_path, rng):
    """A 32-ring bag passes validation when the sensor config matches
    (run.py --n-scans-sensor 32)."""
    path = str(tmp_path / "ok32.bag")
    with rb.BagWriter(path) as w:
        xyz = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
        ring = rng.integers(0, 32, 100).astype(np.uint16)
        w.write("/velodyne_points", "sensor_msgs/PointCloud2", 1.0,
                rb.encode_pointcloud2(1.0, xyz, None, ring, None))
    scans = list(rb.scan_stream(path, n_scans_sensor=32))
    assert len(scans) == 1 and scans[0]["ring"].max() < 32


# ---------------------------------------------------------------------------
# spec-level hardening fixtures (VERDICT r2 item 5)
# ---------------------------------------------------------------------------


def test_lz4_block_and_frame_unit():
    """Hand-crafted LZ4 vectors: overlapping match, stored blocks, legacy
    frames — every decoder path."""
    import struct
    from rgc_slam_tpu.io import lz4

    # block: 3 literals 'abc', then match offset 3 length 10 (overlap copy)
    blk = bytes([0x36]) + b"abc" + struct.pack("<H", 3)
    out = bytearray()
    lz4._decode_block(blk, out)
    assert bytes(out) == b"abcabcabcabca"

    # literal-extension path (>=15 literals)
    raw = bytes(range(256)) * 3
    out2 = bytearray()
    lz4._decode_block(lz4._encode_block_naive(raw), out2)
    assert bytes(out2) == raw

    # frame with compressed blocks, multiple blocks (linked window)
    data = b"The quick brown fox jumps over the lazy dog. " * 100
    assert lz4.decompress(lz4.compress_frame(data, block_size=512)) == data
    # frame with stored (uncompressed-bit) blocks
    assert lz4.decompress(lz4.compress_frame(data, stored=True)) == data
    # legacy frame
    legacy = struct.pack("<I", lz4.LEGACY_MAGIC)
    blk2 = lz4._encode_block_naive(data)
    legacy += struct.pack("<I", len(blk2)) + blk2
    assert lz4.decompress(legacy) == data
    # garbage magic rejected
    with pytest.raises(ValueError):
        lz4.decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_bag_lz4_chunks(tmp_path):
    """lz4 is the default chunk compression of many recorders — the reader
    must replay such bags identically to uncompressed ones."""
    path = str(tmp_path / "l.bag")
    rng2 = np.random.default_rng(5)
    _write_bag(path, rng2, compression="lz4")
    scans = list(rb.scan_stream(path))
    assert len(scans) == 4
    rng2 = np.random.default_rng(5)
    xyz, inten, ring, rel = _make_scan(rng2)
    np.testing.assert_allclose(scans[0]["xyz"], xyz, rtol=1e-6)
    np.testing.assert_array_equal(scans[0]["ring"], ring)


def test_lz4_frame_blocks_fit_declared_bd():
    """compress_frame declares a 64 KB BD; every emitted block (including
    the all-literal encoding overhead) must fit it, or standard decoders
    reject the frame (BagWriter uses this for whole chunk payloads)."""
    import struct
    from rgc_slam_tpu.io import lz4

    raw = bytes(range(256)) * 1024              # 256 KB, incompressible-ish
    frame = lz4.compress_frame(raw)
    assert lz4.decompress(frame) == raw
    pos = 7                                     # magic + FLG/BD/HC
    while True:
        (word,) = struct.unpack_from("<I", frame, pos)
        pos += 4
        if word == 0:
            break
        bsize = word & 0x7FFFFFFF
        assert bsize <= 65536, f"block {bsize} exceeds the declared 64 KB BD"
        pos += bsize


def test_lz4_legacy_truncated_block_raises():
    """A legacy frame cut mid-block must raise, not silently return a
    shortened payload (the corrupt-chunk policy of the module docstring)."""
    import struct
    from rgc_slam_tpu.io import lz4

    raw = b"hello corridor" * 100
    blk = lz4._encode_block_naive(raw)
    legacy = struct.pack("<I", lz4.LEGACY_MAGIC) + struct.pack("<I", len(blk)) + blk
    assert lz4.decompress(legacy) == raw
    with pytest.raises(ValueError, match="truncated legacy"):
        lz4.decompress(legacy[: len(legacy) // 2])


def test_lz4_malformed_length_run():
    """A length-extension run cut off by the block end must raise a decode
    error (IndexError from the byte reads), and the bag reader must treat it
    like any corrupt chunk — stop replay, not crash."""
    import struct
    from rgc_slam_tpu.io import lz4

    frame = (
        struct.pack("<I", lz4.FRAME_MAGIC)
        + bytes([0x40, 0x70, 0x00])          # FLG/BD/HC
        + struct.pack("<I", 1) + b"\xf0"     # 1-byte block: ll=15, run cut off
        + struct.pack("<I", 0)
    )
    with pytest.raises((ValueError, IndexError)):
        lz4.decompress(frame)


def test_bag_corrupt_lz4_chunk_stops_cleanly(tmp_path):
    """Corruption inside an lz4 chunk payload stops replay gracefully (the
    reader catches ValueError AND IndexError from the decoder)."""
    path = str(tmp_path / "c.bag")
    rng2 = np.random.default_rng(9)
    _write_bag(path, rng2, compression="lz4")
    raw = bytearray(open(path, "rb").read())
    # find the lz4 frame magic of the first chunk and trash the bytes after it
    import struct
    from rgc_slam_tpu.io import lz4 as _lz4

    pos = raw.find(struct.pack("<I", _lz4.FRAME_MAGIC))
    assert pos > 0
    raw[pos + 7: pos + 15] = b"\xf0" * 8
    bad = str(tmp_path / "bad.bag")
    open(bad, "wb").write(bytes(raw))
    scans = list(rb.scan_stream(bad))       # must not raise
    assert len(scans) < 4


def test_bag_truncated_tail(tmp_path):
    """A crashed recorder leaves a half-written trailing record; replay must
    yield everything before it and stop cleanly (like rosbag play)."""
    path = str(tmp_path / "t.bag")
    rng2 = np.random.default_rng(6)
    _write_bag(path, rng2, n_scans=4)
    full = open(path, "rb").read()
    # cut inside the final chunk record's data section
    cut = len(full) - len(full) // 5
    trunc = str(tmp_path / "trunc.bag")
    with open(trunc, "wb") as f:
        f.write(full[:cut])
    scans = list(rb.scan_stream(trunc))
    assert 1 <= len(scans) < 4          # earlier chunks replay, tail dropped
    assert np.isfinite(scans[0]["xyz"]).all()


def test_bag_unchunked_toplevel_messages(tmp_path):
    """Some tools write connection + message records at top level (no chunk
    wrapper); the sequential scan must still yield them."""
    import struct
    from rgc_slam_tpu.io.rosbag import (
        MAGIC, OP_BAGHDR, OP_CONN, OP_MSG, _encode_header, _time, _u32, _u64,
    )

    path = str(tmp_path / "flat.bag")
    msg = rb.encode_imu(10.0, [0, 0, 9.81], [0, 0, 0])
    with open(path, "wb") as f:
        f.write(MAGIC)
        hdr = _encode_header({b"op": bytes([OP_BAGHDR]),
                              b"index_pos": _u64(0), b"conn_count": _u32(1),
                              b"chunk_count": _u32(0)})
        f.write(_u32(len(hdr)) + hdr + _u32(4) + b"    ")
        ch = _encode_header({b"op": bytes([OP_CONN]), b"conn": _u32(0),
                             b"topic": b"/imu"})
        cd = _encode_header({b"topic": b"/imu", b"type": b"sensor_msgs/Imu",
                             b"md5sum": b"*", b"message_definition": b""})
        f.write(_u32(len(ch)) + ch + _u32(len(cd)) + cd)
        mh = _encode_header({b"op": bytes([OP_MSG]), b"conn": _u32(0),
                             b"time": _time(10.0)})
        f.write(_u32(len(mh)) + mh + _u32(len(msg)) + msg)
    with rb.BagReader(path) as r:
        out = list(r.read_messages())
    assert len(out) == 1
    topic, t, raw, conn = out[0]
    assert topic == "/imu" and abs(t - 10.0) < 1e-6
    imu = rb.read_imu(raw)
    np.testing.assert_allclose(imu["acc"], [0, 0, 9.81])


def test_bag_duplicate_latched_connections(tmp_path, rng):
    """Latched topics repeat their connection record (top level AND in later
    chunks); duplicates must be idempotent and messages still route."""
    path = str(tmp_path / "d.bag")
    rng2 = np.random.default_rng(7)
    _write_bag(path, rng2, n_scans=3)
    # append a duplicate of every top-level connection record at EOF
    from rgc_slam_tpu.io.rosbag import OP_CONN, _encode_header, _u32

    dup = _encode_header({b"op": bytes([OP_CONN]), b"conn": _u32(0),
                          b"topic": b"/mynteye/imu/data_raw"})
    dupd = _encode_header({b"topic": b"/mynteye/imu/data_raw",
                           b"type": b"sensor_msgs/Imu", b"md5sum": b"*",
                           b"message_definition": b""})
    with open(path, "ab") as f:
        f.write(_u32(len(dup)) + dup + _u32(len(dupd)) + dupd)
    scans = list(rb.scan_stream(path))
    assert len(scans) == 3
    assert len(scans[0]["imu_t"]) == 10


def test_bag_bigendian_rejected(tmp_path):
    """A set is_bigendian flag must fail loudly, not decode garbage."""
    xyz = np.zeros((10, 3), np.float32)
    raw = rb.encode_pointcloud2(1.0, xyz, bigendian=True)
    with pytest.raises(IOError, match="bigendian"):
        rb.read_pointcloud2(raw)


def test_pointcloud2_misaligned_fields():
    """ring (2 bytes) before time leaves 'time' on an odd offset — decoding
    must not require aligned fields (strided-slice path)."""
    rng2 = np.random.default_rng(8)
    xyz, inten, ring, rel = _make_scan(rng2, n=64)
    raw = rb.encode_pointcloud2(2.0, xyz, inten, ring, rel)
    out = rb.read_pointcloud2(raw)
    # field offsets: x0 y4 z8 intensity12 ring16 time18 (18 % 4 != 0)
    np.testing.assert_allclose(out["xyz"], xyz, rtol=1e-7)
    np.testing.assert_allclose(out["time"], rel, rtol=1e-6)
    np.testing.assert_array_equal(out["ring"], ring)


@pytest.mark.parametrize("compression", ["none", "lz4", "bz2"])
def test_bag_truncation_fuzz_sweep(tmp_path, compression):
    """Seeded byte-truncation fuzz (VERDICT r3 item 7): cut a valid bag at
    25 random offsets each and replay.  The reader must STOP GRACEFULLY
    every time — yield some prefix of the scans, never an unhandled
    exception.  (A truncation that lands inside the 13-byte bag header may
    legitimately raise IOError("not a rosbag") — that is the loud-and-clear
    path, also graceful.)"""
    path = str(tmp_path / f"fz_{compression}.bag")
    rng2 = np.random.default_rng(11)
    _write_bag(path, rng2, compression=compression)
    full = open(path, "rb").read()
    fuzz = np.random.default_rng(1234)
    cuts = sorted(set(
        int(c) for c in fuzz.integers(1, len(full), size=25)
    ))
    for cut in cuts:
        bad = str(tmp_path / "cut.bag")
        with open(bad, "wb") as f:
            f.write(full[:cut])
        try:
            scans = list(rb.scan_stream(bad))
        except IOError as e:
            # only the explicit validation error is acceptable
            assert "rosbag" in str(e) or "bigendian" in str(e), (cut, e)
            continue
        assert len(scans) <= 4, (cut, len(scans))
        for s in scans:
            assert np.isfinite(s["xyz"]).all(), (cut, "NaN leaked")


def test_bag_byteflip_fuzz_sweep(tmp_path):
    """Seeded byte-FLIP fuzz: corrupt one byte at 20 random offsets of an
    lz4 bag.  Replay must never raise anything but the reader's own
    IOError; decoded scans must stay finite."""
    path = str(tmp_path / "flip.bag")
    rng2 = np.random.default_rng(12)
    _write_bag(path, rng2, compression="lz4")
    full = bytearray(open(path, "rb").read())
    fuzz = np.random.default_rng(99)
    offs = sorted(set(int(c) for c in fuzz.integers(13, len(full), size=20)))
    for off in offs:
        bad_bytes = bytearray(full)
        bad_bytes[off] ^= 0xA5
        bad = str(tmp_path / "flip_cut.bag")
        with open(bad, "wb") as f:
            f.write(bytes(bad_bytes))
        try:
            scans = list(rb.scan_stream(bad))
        except IOError as e:
            continue                 # the reader's own validation error
        for s in scans:
            assert np.isfinite(s["xyz"]).all(), (off, "NaN leaked")
