"""Config/secret provider (E4 parity, lib/Secrets.py:38-52).

The reference resolves API keys from a cloud secret manager with an
environment-variable fallback. The engine keeps the same resolution
contract behind a provider-chain interface, with only the env and
static providers implemented (cloud managers are out of engine scope —
plug one in as a callable).
"""

from __future__ import annotations

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
