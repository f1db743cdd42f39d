#!/usr/bin/env python3
"""Independent GTFS-RT protobuf wire-format encoder used ONLY to
generate golden fixture bytes for GtfsRtProtoSpec. Implements the
public protobuf wire encoding (varint / length-delimited / fixed32 /
fixed64) from scratch so the Scala ProtoWire/GtfsRtProto encoder is
checked against a second, independently written implementation.

Prints hex strings for three FeedMessages built from the same fixture
rows the spec feeds through FeedAssembler.
"""
import struct


def varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # sign-extend to 64 bits, as protobuf does
    out = bytearray()
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def f_varint(field: int, v: int) -> bytes:
    return tag(field, 0) + varint(v)


def f_string(field: int, s: str) -> bytes:
    b = s.encode("utf-8")
    return tag(field, 2) + varint(len(b)) + b


def f_msg(field: int, body: bytes) -> bytes:
    return tag(field, 2) + varint(len(body)) + body


def f_float(field: int, v: float) -> bytes:
    return tag(field, 5) + struct.pack("<f", v)


def f_double(field: int, v: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", v)


def trip_descriptor(trip_id=None, start_time=None, start_date=None,
                    sched_rel=None, route_id=None, direction_id=None) -> bytes:
    b = b""
    if trip_id is not None:
        b += f_string(1, trip_id)
    if start_time is not None:
        b += f_string(2, start_time)
    if start_date is not None:
        b += f_string(3, start_date)
    if sched_rel is not None:
        b += f_varint(4, sched_rel)
    if route_id is not None:
        b += f_string(5, route_id)
    if direction_id is not None:
        b += f_varint(6, direction_id)
    return b


def vehicle_descriptor(vid=None, label=None) -> bytes:
    b = b""
    if vid is not None:
        b += f_string(1, vid)
    if label is not None:
        b += f_string(2, label)
    return b


def stop_time_event(delay=None, time=None, uncertainty=None) -> bytes:
    b = b""
    if delay is not None:
        b += f_varint(1, delay)
    if time is not None:
        b += f_varint(2, time)
    if uncertainty is not None:
        b += f_varint(3, uncertainty)
    return b


def stop_time_update(seq=None, arrival=None, departure=None,
                     stop_id=None, sched_rel=None) -> bytes:
    b = b""
    if seq is not None:
        b += f_varint(1, seq)
    if arrival is not None:
        b += f_msg(2, arrival)
    if departure is not None:
        b += f_msg(3, departure)
    if stop_id is not None:
        b += f_string(4, stop_id)
    if sched_rel is not None:
        b += f_varint(5, sched_rel)
    return b


def translated(text, lang="de-DE") -> bytes:
    return f_msg(1, f_string(1, text) + f_string(2, lang))


def header(ts: int) -> bytes:
    return f_string(1, "2.0") + f_varint(2, 0) + f_varint(3, ts)


def feed(ts: int, entities) -> bytes:
    return f_msg(1, header(ts)) + b"".join(f_msg(2, e) for e in entities)


# --- trip update feed: tu1 (tu2 dropped: no stop_time_updates) ---
td1 = trip_descriptor("t1", "08:00:00", "20240109", 0, "r1", 0)
stu1 = stop_time_update(1, stop_time_event(delay=0),
                        stop_time_event(delay=0, time=1704790800), "s1", 0)
stu2 = stop_time_update(2, stop_time_event(delay=60),
                        stop_time_event(delay=60), "s2", 0)
tu = f_msg(1, td1) + f_msg(2, stu1) + f_msg(2, stu2)
ent_tu1 = f_string(1, "tu1") + f_msg(3, tu)
print("trip_updates:", feed(1704790000, [ent_tu1]).hex())

# --- alert feed: a2 first (newest active period), then a1 ---
a2 = (f_msg(1, f_varint(1, 500) + f_varint(2, 600))  # active_period
      + f_varint(6, 6)                                # cause ACCIDENT
      + f_varint(7, 3)                                # effect SIGNIFICANT_DELAYS
      + f_msg(10, translated("Header B"))
      + f_msg(11, translated("Desc B")))
ie1 = f_string(2, "r1") + f_string(5, "s1")           # EntitySelector
a1 = (f_msg(1, f_varint(1, 100) + f_varint(2, 200))
      + f_msg(5, ie1)
      + f_varint(6, 10)                               # cause CONSTRUCTION
      + f_varint(7, 4)                                # effect DETOUR
      + f_msg(8, translated("http://x"))
      + f_msg(10, translated("Header A"))
      + f_msg(11, translated("Desc A")))
ents_alerts = [f_string(1, "a2") + f_msg(5, a2), f_string(1, "a1") + f_msg(5, a1)]
print("alerts:", feed(1704790000, ents_alerts).hex())

# --- vehicle position feed: vp1 ---
pos = (f_float(1, 48.1) + f_float(2, 11.5) + f_float(3, 90.0)
       + f_double(4, 1234.5) + f_float(5, 12.3))
vp = (f_msg(1, td1)
      + f_msg(2, pos)
      + f_varint(3, 3)                                # current_stop_sequence
      + f_varint(4, 2)                                # IN_TRANSIT_TO
      + f_varint(5, 1704790500)                       # timestamp
      + f_varint(6, 1)                                # RUNNING_SMOOTHLY
      + f_string(7, "s3")
      + f_msg(8, vehicle_descriptor("veh1", "Bus 1")))
ent_vp1 = f_string(1, "vp1") + f_msg(4, vp)
print("vehicle_positions:", feed(1704790000, [ent_vp1]).hex())
