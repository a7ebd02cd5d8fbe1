"""MQTT client protocol test against an in-process fake broker."""
import asyncio
import json

import pytest

from deepdish_tpu.pipeline.mqtt import MQTTClient


@pytest.mark.timeout(60)
def test_mqtt_connect_publish():
    async def run():
        received = {}

        async def broker(reader, writer):
            data = await reader.read(512)
            received['connect'] = data
            # minimal CONNACK
            writer.write(bytes([0x20, 0x02, 0x00, 0x00]))
            await writer.drain()
            # read the PUBLISH packet
            pkt = await asyncio.wait_for(reader.read(1024), timeout=10)
            received['publish'] = pkt

        server = await asyncio.start_server(broker, '127.0.0.1', 0)
        port = server.sockets[0].getsockname()[1]

        client = MQTTClient('test-client', '127.0.0.1', port,
                            username='u', password='p')
        await asyncio.wait_for(client.connect(), timeout=15)
        assert client.connected.is_set()
        payload = json.dumps({"acp_event": "crossing", "poscount_person": 1})
        client.publish('acp/topic', payload)
        await asyncio.sleep(0.3)
        await asyncio.wait_for(client.disconnect(), timeout=10)
        server.close()

        con = received['connect']
        assert con[0] == 0x10                       # CONNECT
        assert b"MQTT" in con
        assert b"test-client" in con
        assert b"u" in con and b"p" in con          # auth present
        pub = received['publish']
        assert pub[0] & 0xF0 == 0x30                # PUBLISH QoS0
        assert b"acp/topic" in pub
        assert b"poscount_person" in pub

    asyncio.run(run())
