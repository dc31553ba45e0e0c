"""TensorBoard event-writer round trip: parse the TFRecord framing and the
Event/Summary protobuf back out and verify CRCs, tags, values."""
import struct

from gear_tpu import metrics


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (ln,) = struct.unpack_from("<Q", data, pos)
        hdr = data[pos:pos + 8]
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert metrics._masked_crc(hdr) == hcrc
        payload = data[pos + 12:pos + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + ln)
        assert metrics._masked_crc(payload) == pcrc
        out.append(payload)
        pos += 12 + ln + 4
    return out


def _parse_fields(msg):
    """Tiny protobuf wire parser -> {field_num: [values]}."""
    fields = {}
    pos = 0
    while pos < len(msg):
        key = msg[pos]
        num, wt = key >> 3, key & 7
        pos += 1
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = msg[pos]
                v |= (b & 0x7F) << shift
                pos += 1
                shift += 7
                if not b & 0x80:
                    break
        elif wt == 1:  # 64-bit
            (v,) = struct.unpack_from("<d", msg, pos)
            pos += 8
        elif wt == 2:  # length-delimited
            ln = msg[pos]
            pos += 1
            v = msg[pos:pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            (v,) = struct.unpack_from("<f", msg, pos)
            pos += 4
        else:
            raise AssertionError(f"wire type {wt}")
        fields.setdefault(num, []).append(v)
    return fields


def test_scalar_writer_roundtrip(tmp_path):
    with metrics.ScalarWriter(tmp_path) as w:
        w.scalar("accuracy/gsm8k", 0.41, step=3)
        w.scalar("accuracy/macro", 0.5)

    ev_files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(ev_files) == 1
    recs = _read_records(ev_files[0])
    assert len(recs) == 3  # file_version + 2 scalars

    head = _parse_fields(recs[0])
    assert head[3] == [b"brain.Event:2"]

    ev = _parse_fields(recs[1])
    assert ev[2] == [3]                         # step
    summ = _parse_fields(ev[5][0])
    val = _parse_fields(summ[1][0])
    assert val[1] == [b"accuracy/gsm8k"]
    assert abs(val[2][0] - 0.41) < 1e-6

    # jsonl mirror
    lines = (tmp_path / "scalars.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2 and "accuracy/gsm8k" in lines[0]


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert metrics.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert metrics.crc32c(b"") == 0
    assert metrics.crc32c(b"123456789") == 0xE3069283
    assert metrics.crc32c(b"a") == 0xC1D04330


# Byte-exact golden file for a fixed scalar sequence. The expected bytes were
# hand-derived from the TensorBoard wire specs (TFRecord framing: <Q length,
# <I masked-crc32c of the 8 length bytes, payload, <I masked crc of payload;
# Event proto fields 1=wall_time double, 2=step varint, 3=file_version,
# 5=Summary{1=Value{1=tag, 2=simple_value float}}) and cross-checked field by
# field against an independent reconstruction — a single varint/field-number
# mistake anywhere in metrics.py makes this fail.
_GOLDEN_HEX = (
    "1a00000000000000129bd82d090000000000408f4010001a0d627261696e2e4576656e"
    "743a326c6117dd1e00000000000000d9dc1232090000000000448f4010032a110a0f0a"
    "086163637572616379150000803e593e298520000000000000002"
    "9eda950090000000000488f4010042a130a110a0a6c6f73732f746f74616c150000c0"
    "bfdb36dd0d"
)


def test_scalar_writer_golden_bytes(tmp_path):
    w = metrics.ScalarWriter(tmp_path, _ts=1000.0, _host="golden")
    w.scalar("accuracy", 0.25, step=3, _ts=1000.5)
    w.scalar("loss/total", -1.5, step=4, _ts=1001.0)
    w.close()
    data = (tmp_path / "events.out.tfevents.1000.golden").read_bytes()
    assert data.hex() == _GOLDEN_HEX

    # independently re-derive the first two records from the proto spec
    exp1 = (b"\x09" + struct.pack("<d", 1000.0) + b"\x10\x00"
            + b"\x1a\x0d" + b"brain.Event:2")
    hdr1 = struct.pack("<Q", len(exp1))
    rec1 = (hdr1 + struct.pack("<I", metrics._masked_crc(hdr1)) + exp1
            + struct.pack("<I", metrics._masked_crc(exp1)))
    assert data[:len(rec1)] == rec1

    val = b"\x0a\x08" + b"accuracy" + b"\x15" + struct.pack("<f", 0.25)
    summ = b"\x0a" + bytes([len(val)]) + val
    exp2 = (b"\x09" + struct.pack("<d", 1000.5) + b"\x10\x03"
            + b"\x2a" + bytes([len(summ)]) + summ)
    hdr2 = struct.pack("<Q", len(exp2))
    rec2 = (hdr2 + struct.pack("<I", metrics._masked_crc(hdr2)) + exp2
            + struct.pack("<I", metrics._masked_crc(exp2)))
    assert data[len(rec1):len(rec1) + len(rec2)] == rec2
