"""Import stub for the reference deepdish.py (quart is not installed).

deepdish.py builds `webapp = Quart(__name__)` at module scope and
decorates routes (/root/reference/deepdish.py:138,183,1542,1564); none of
the web machinery runs in the parity tests.
"""


class Quart:
    def __init__(self, name):
        self.name = name

    def route(self, *args, **kwargs):
        def deco(fn):
            return fn
        return deco

    def before_serving(self, fn):
        return fn

    def after_serving(self, fn):
        return fn


class Response:
    def __init__(self, *args, **kwargs):
        pass


current_app = None
