"""Stub: the parity tests call Pipeline.start() directly, never serve()."""


async def serve(*args, **kwargs):
    raise RuntimeError("hypercorn stub: serve() should not be called")
