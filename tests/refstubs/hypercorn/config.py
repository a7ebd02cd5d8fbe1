"""Stub config for the hypercorn import in the reference deepdish.py."""


class Config:
    pass
