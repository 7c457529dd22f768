"""Dimension <-> integer encoding for the itemset miner.

Port of utils/encoder/IntegerEncoder.scala:12-55: per-dimension-name
value maps handing out sequential integer codes, with reverse lookup.
The reference re-reads group/level from its static AppConfig on decode
(IntegerEncoder.scala:46-47, with a commented-out CSV-test variant);
here the (group, level) resolver is injected so pipelines and tests
configure it explicitly.
"""

from __future__ import annotations

from typing import Callable

from .models import Dimension

GroupLevelResolver = Callable[[str], tuple[str, int]]


class ConstantResolver:
    """Picklable resolver (encoder state is pickled into the streaming
    state store). The reference's CSV-test behavior
    (IntegerEncoder.scala:50-52)."""

    def __init__(self, group: str = "column", level: int = 1) -> None:
        self.group = group
        self.level = level

    def __call__(self, _name: str) -> tuple[str, int]:
        return (self.group, self.level)


def constant_resolver(group: str = "column", level: int = 1) -> GroupLevelResolver:
    return ConstantResolver(group, level)


class IntegerEncoder:
    def __init__(self, resolver: GroupLevelResolver | None = None) -> None:
        self._encoding: dict[str, dict[str, int]] = {}
        self._next_key = 0
        self._int_to_name: dict[int, str] = {}
        self._resolver = resolver if resolver is not None else constant_resolver()

    def get_integer_encoding(self, dimension: Dimension) -> int:
        value_map = self._encoding.setdefault(dimension.name, {})
        code = value_map.get(dimension.value)
        if code is None:
            code = self._next_key
            self._next_key += 1
            self._int_to_name[code] = dimension.name
            value_map[dimension.value] = code
        return code

    def get_attribute(self, encoded: int) -> Dimension:
        name = self._int_to_name.get(encoded)
        value_map = self._encoding.get(name, {})
        value = None
        for v, code in value_map.items():
            if code == encoded:
                value = v
        group, level = self._resolver(name)
        return Dimension(name, value, group, level)
