"""Import stub for the reference deepdish.py (cameratransform is not
installed). Only used with --3d, which the parity tests do not pass."""


class RectilinearProjection:
    def __init__(self, **kwargs):
        pass


class SpatialOrientation:
    def __init__(self, **kwargs):
        pass


class Camera:
    def __init__(self, *args, **kwargs):
        pass

    def spaceFromImage(self, pts):
        return pts
