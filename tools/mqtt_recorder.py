"""Minimal MQTT recorder broker: CONNACK + log every PUBLISH to stdout.

Stands in for the Adaptive City broker when driving the real app
(deepdish-tpu --mqtt-broker 127.0.0.1 --mqtt-port ...) on hardware — the
reference's MQTT contract is JSON payloads on a configured topic
(README.md:70-81, deepdish.py:1141-1185); this prints one line per
message: `TOPIC <tab> PAYLOAD`. QoS0 only (all the app sends).

Run: python tools/mqtt_recorder.py [--port 1883] [--out FILE]
"""
from __future__ import annotations

import argparse
import asyncio
import sys


def _decode_publish(pkt: bytes):
    """Parse one MQTT fixed-header packet; return (topic, payload) for
    PUBLISH, None otherwise. Assumes QoS0 (no packet id)."""
    if not pkt or pkt[0] & 0xF0 != 0x30:
        return None
    # variable-length remaining-length field
    mult, rem, i = 1, 0, 1
    while True:
        b = pkt[i]
        rem += (b & 0x7F) * mult
        mult *= 128
        i += 1
        if not b & 0x80:
            break
    tlen = (pkt[i] << 8) | pkt[i + 1]
    topic = pkt[i + 2:i + 2 + tlen].decode("utf-8", "replace")
    payload = pkt[i + 2 + tlen:i + 1 + rem].decode("utf-8", "replace")
    return topic, payload


async def _read_packet(reader):
    """Read one MQTT packet (fixed header + remaining length + body)."""
    hdr = await reader.readexactly(1)
    rem, mult = 0, 1
    lenbytes = b""
    while True:
        b = await reader.readexactly(1)
        lenbytes += b
        rem += (b[0] & 0x7F) * mult
        mult *= 128
        if not b[0] & 0x80:
            break
    body = await reader.readexactly(rem) if rem else b""
    return hdr + lenbytes + body


async def handle(reader, writer, out):
    peer = writer.get_extra_info("peername")
    try:
        pkt = await _read_packet(reader)
        if pkt[0] & 0xF0 == 0x10:                     # CONNECT
            writer.write(bytes([0x20, 0x02, 0x00, 0x00]))
            await writer.drain()
            print(f"# CONNECT from {peer}", file=out, flush=True)
        while True:
            pkt = await _read_packet(reader)
            kind = pkt[0] & 0xF0
            if kind == 0x30:
                topic, payload = _decode_publish(pkt)
                print(f"{topic}\t{payload}", file=out, flush=True)
            elif kind == 0xC0:                        # PINGREQ -> PINGRESP
                writer.write(bytes([0xD0, 0x00]))
                await writer.drain()
            elif kind == 0xE0:                        # DISCONNECT
                break
    except (asyncio.IncompleteReadError, ConnectionResetError):
        pass
    finally:
        writer.close()
        print(f"# client {peer} gone", file=out, flush=True)


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=1883)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = open(args.out, "w") if args.out else sys.stdout
    server = await asyncio.start_server(
        lambda r, w: handle(r, w, out), "127.0.0.1", args.port)
    print(f"# recorder listening on 127.0.0.1:{args.port}", file=out,
          flush=True)
    async with server:
        await server.serve_forever()


if __name__ == "__main__":
    asyncio.run(main())
