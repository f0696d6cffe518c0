"""Round-trip the dependency-free TensorBoard event writer with an
INDEPENDENT decoder (tensorflow/tensorboard are not in this image, so the
test decodes the TFRecord framing + Event proto by hand from the spec
rather than reusing the writer's encoder internals)."""

import glob
import os
import struct

from hosnerf_tpu.utils import tb_writer


def _read_records(path):
    """Independent TFRecord reader: verifies both masked CRCs."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return out
            (n,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            data = f.read(n)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_h == tb_writer._masked_crc(hdr)
            assert crc_d == tb_writer._masked_crc(data)
            out.append(data)


def _decode_varint(b, i):
    v, shift = 0, 0
    while True:
        v |= (b[i] & 0x7F) << shift
        shift += 7
        i += 1
        if not b[i - 1] & 0x80:
            return v, i


def _decode_fields(b):
    """proto wire format -> {field: [raw values]}"""
    i, fields = 0, {}
    while i < len(b):
        key, i = _decode_varint(b, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _decode_varint(b, i)
        elif wire == 1:
            v = b[i:i + 8]
            i += 8
        elif wire == 5:
            v = b[i:i + 4]
            i += 4
        elif wire == 2:
            n, i = _decode_varint(b, i)
            v = b[i:i + n]
            i += n
        else:
            raise AssertionError(f"wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_scalar_events_roundtrip(tmp_path):
    w = tb_writer.TBWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.25, 7)
    w.add_scalar("train/psnr", 31.5, 8)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    recs = _read_records(files[0])
    assert len(recs) == 3  # file_version + 2 scalars

    # record 0: Event.file_version (field 3) == brain.Event:2
    f0 = _decode_fields(recs[0])
    assert f0[3][0] == b"brain.Event:2"

    # record 1: step 7, summary.value {tag, simple_value}
    for rec, (tag, val, step) in zip(
            recs[1:], [("train/loss", 0.25, 7), ("train/psnr", 31.5, 8)]):
        ev = _decode_fields(rec)
        assert ev[2][0] == step                      # Event.step int64
        (wall,) = struct.unpack("<d", ev[1][0])      # Event.wall_time
        assert wall > 1e9
        summary = _decode_fields(ev[5][0])           # Event.summary
        value = _decode_fields(summary[1][0])        # Summary.value[0]
        assert value[1][0].decode() == tag           # Value.tag
        (sv,) = struct.unpack("<f", value[2][0])     # Value.simple_value
        assert abs(sv - val) < 1e-6


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C
    assert tb_writer.crc32c(b"123456789") == 0xE3069283
    assert tb_writer.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_metric_logger_writes_tb(tmp_path):
    from hosnerf_tpu.train.loop import MetricLogger
    lg = MetricLogger(str(tmp_path), log_every=1)
    lg.log(1, {"loss": 0.5}, rays_per_step=128, lr=1e-3)
    lg.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert files and len(_read_records(files[0])) >= 2
