"""Config/secret provider (E4 parity, lib/Secrets.py:38-52).

The reference resolves API keys from a cloud secret manager with an
environment-variable fallback. The engine keeps the same resolution
contract behind a provider-chain interface: ``file_provider`` stands in
for the manager (same versions/latest addressing, same swallow-errors-
and-fall-through behavior, lib/Secrets.py:24-35), ``env_provider`` is
the fallback, and a real cloud manager plugs in as any callable.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Mapping, Optional, Sequence

Provider = Callable[[str], Optional[str]]


def env_provider(prefix: str = "") -> Provider:
    def get(name: str) -> Optional[str]:
        return os.environ.get(prefix + name)

    return get


def static_provider(values: Mapping[str, str]) -> Provider:
    def get(name: str) -> Optional[str]:
        return values.get(name)

    return get


def file_provider(path: str, version: str = "latest") -> Provider:
    """Secret-manager-shaped provider over a local JSON document.

    Two value shapes per secret name: a plain string, or a versioned
    ``{"1": ..., "2": ...}`` map addressed by ``version`` ("latest" =
    highest integer key — the manager's ``versions/latest`` contract).
    Any failure (missing file, bad JSON, absent name/version) resolves
    to None so the chain falls through, matching the reference's
    swallow-and-fall-back manager semantics (lib/Secrets.py:24-35).
    """

    def get(name: str) -> Optional[str]:
        try:
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
            entry = doc[name]
            if isinstance(entry, str):
                return entry
            if version == "latest":
                key = max(entry, key=int)
            else:
                key = version
            v = entry[key]
            return v if isinstance(v, str) else None
        except Exception:
            return None

    return get


class Secrets:
    """Resolution chain: first provider that answers wins
    (secret-manager-then-env parity, lib/Secrets.py:38-52)."""

    def __init__(self, providers: Sequence[Provider] = ()):
        self._providers = list(providers) or [env_provider()]

    def get_api_key(self, key_name: str) -> str:
        for p in self._providers:
            v = p(key_name)
            if v:
                return v
        raise KeyError(f"secret {key_name!r} not found in any provider")
