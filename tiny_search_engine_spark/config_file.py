"""A2: ``KEY : value`` config-file parser
(/root/reference/src/config_util.cpp:76-103, SURVEY.md §2 A2).

Parity semantics: one ``KEY : value`` pair per line, first ':' splits,
both sides trimmed, blank lines and lines starting with '#' skipped,
later duplicate keys overwrite earlier ones; typed getters fall back to a
default when the key is missing or unparsable (config_util.cpp:18-74).
The Spark engine consumes these values as plain job parameters — there is
no DataFrame involvement, exactly like the reference."""

from __future__ import annotations


class ConfigFile:
    def __init__(self, path: str | None = None, text: str | None = None):
        self.values: dict[str, str] = {}
        if path is not None:
            with open(path, encoding="utf-8") as f:
                text = f.read()
        if text:
            for line in text.splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if ":" not in line:
                    continue
                k, _, v = line.partition(":")
                self.values[k.strip()] = v.strip()

    def get_str(self, key: str, default: str = "") -> str:
        return self.values.get(key, default)

    def get_int(self, key: str, default: int = 0) -> int:
        try:
            return int(self.values[key])
        except (KeyError, ValueError):
            return default

    def get_float(self, key: str, default: float = 0.0) -> float:
        try:
            return float(self.values[key])
        except (KeyError, ValueError):
            return default

    def get_bool(self, key: str, default: bool = False) -> bool:
        v = self.values.get(key)
        if v is None:
            return default
        return v.lower() in ("1", "true", "yes", "on")
