"""Picklable closure wrapper (reference detectron2/utils/serialize.py).

Used to ship closures (dataset map functions, lazy-config callables) across
process boundaries; cloudpickle handles lambdas/closures that plain pickle
rejects.
"""

import cloudpickle

__all__ = ["PicklableWrapper"]


class PicklableWrapper:
    """Wrap an object so that pickling routes through cloudpickle.

    Matches the reference surface: wrapping an already-wrapped object
    unwraps first, calls and attribute access delegate to the wrapped
    object.
    """

    def __init__(self, obj):
        while isinstance(obj, PicklableWrapper):
            obj = obj._obj
        self._obj = obj

    def __reduce__(self):
        s = cloudpickle.dumps(self._obj)
        return cloudpickle.loads, (s,)

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr):
        if attr not in ["_obj"]:
            return getattr(self._obj, attr)
        return getattr(self, attr)
