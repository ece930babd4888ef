"""TB event writer: TFRecord framing + Event proto must round-trip through an
independent decoder (this test implements its own reader — format oracle)."""

import os
import struct

import numpy as np

from uresnet_tpu.engine.tb_writer import TBWriter, _crc32c, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (n,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(hdr)
            data = f.read(n)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(data)
            out.append(data)
    return out


def _parse_proto(data):
    """Tiny schema-less proto parser: returns {field: [values]}."""
    fields = {}
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]; i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0; shift = 0
            while True:
                b = data[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", data[i:i + 8])[0]; i += 8
        elif wire == 5:
            v = struct.unpack("<f", data[i:i + 4])[0]; i += 4
        elif wire == 2:
            n = 0; shift = 0
            while True:
                b = data[i]; i += 1
                n |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = data[i:i + n]; i += n
        else:
            raise ValueError(f"wire {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_event_file_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path), name="t")
    w.scalars(5, {"loss": 1.25, "acc": 0.5})
    w.scalars(10, {"loss": 0.75})
    w.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(files) == 1
    records = _read_records(os.path.join(tmp_path, files[0]))
    assert len(records) == 3
    head = _parse_proto(records[0])
    assert head[3] == [b"brain.Event:2"]

    ev = _parse_proto(records[1])
    assert ev[2] == [5]  # step
    summary = _parse_proto(ev[5][0])
    vals = {}
    for v in summary[1]:
        pv = _parse_proto(v)
        vals[pv[1][0].decode()] = pv[2][0]
    assert abs(vals["loss"] - 1.25) < 1e-6
    assert abs(vals["acc"] - 0.5) < 1e-6

    ev2 = _parse_proto(records[2])
    assert ev2[2] == [10]
