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
