"""MJPEG server test: serve a frame, read multipart JPEG over a socket."""
import asyncio

import numpy as np
import pytest

from deepdish_tpu.pipeline.mjpeg import MJPEGServer, StreamingInfo


@pytest.mark.timeout(60)
def test_mjpeg_stream_roundtrip():
    async def run():
        si = StreamingInfo()
        frame = np.zeros((32, 48, 3), np.uint8)
        frame[8:24, 16:32] = 255
        await si.set_frame(frame)
        server = MJPEGServer(si, port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]

        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        data = b""
        while b"\xff\xd9" not in data:  # JPEG EOI marker
            chunk = await asyncio.wait_for(reader.read(4096), timeout=10)
            if not chunk:
                break
            data += chunk
        writer.close()
        await server.stop()
        assert b"200 OK" in data
        assert b"multipart/x-mixed-replace" in data
        assert b"--frame" in data
        assert b"\xff\xd8" in data  # JPEG SOI: an actual image arrived

        # 404 for other paths
        await si.set_frame(frame)
        server2 = MJPEGServer(si, port=0, host="127.0.0.1")
        await server2.start()
        port2 = server2._server.sockets[0].getsockname()[1]
        r2, w2 = await asyncio.open_connection("127.0.0.1", port2)
        w2.write(b"GET /nope HTTP/1.1\r\n\r\n")
        await w2.drain()
        resp = await asyncio.wait_for(r2.read(64), timeout=10)
        assert b"404" in resp
        w2.close()
        await server2.stop()

    asyncio.run(run())
