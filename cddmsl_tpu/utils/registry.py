"""Name -> callable registry.

Mirrors the registry surface of the reference (detectron2/utils/registry.py:60):
META_ARCH_REGISTRY / BACKBONE_REGISTRY / ROI_HEADS_REGISTRY etc. are instances.
"""

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    """A registry mapping names to objects (usually classes or builder fns).

    Usage::

        BACKBONE_REGISTRY = Registry("BACKBONE")

        @BACKBONE_REGISTRY.register()
        def build_clip_resnet_backbone(cfg): ...

        BACKBONE_REGISTRY.get("build_clip_resnet_backbone")
    """

    def __init__(self, name: str) -> None:
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise ValueError(
                f"An object named '{name}' was already registered in '{self._name}' registry!"
            )
        self._obj_map[name] = obj

    def register(self, obj: Optional[Any] = None) -> Any:
        if obj is None:
            # used as a decorator
            def deco(func_or_class: Any) -> Any:
                self._do_register(func_or_class.__name__, func_or_class)
                return func_or_class

            return deco
        self._do_register(obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(
                f"No object named '{name}' found in '{self._name}' registry! "
                f"Available: {sorted(self._obj_map)}"
            )
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()
