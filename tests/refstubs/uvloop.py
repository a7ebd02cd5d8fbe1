"""Import stub for the reference deepdish.py (uvloop is not installed).

Only `uvloop.install()` is referenced, and only under __main__
(/root/reference/deepdish.py:61,1578); the parity tests import the module
instead of executing it as a script.
"""


def install():
    pass
