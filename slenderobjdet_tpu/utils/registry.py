"""String-keyed registries, mirroring the registry surface of the reference
(`slender_det/modeling/__init__.py`: META_ARCH / BACKBONE / PROPOSAL_GENERATOR /
ROI_HEADS / META_HEADS registries) so YAML-driven model construction works the
same way."""

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Any] = {}

    def register(self, obj: Optional[Any] = None, name: Optional[str] = None):
        if obj is None:
            # used as decorator with optional name: @REG.register(name="X")
            def deco(fn_or_cls):
                self._do_register(name or fn_or_cls.__name__, fn_or_cls)
                return fn_or_cls

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name: str, obj: Any):
        if name in self._map:
            raise KeyError(f"{name!r} already registered in {self._name} registry")
        self._map[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in {self._name} registry. "
                f"Available: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._map.items())

    def keys(self):
        return self._map.keys()
