"""OAuth credential holder (reference models/oauth_credentials.py:15-33).

The reference wraps Beam ValueProviders; here the values are plain
strings resolved at CLI parse time. The object is what a live transport
adapter (ADAPTERS.md) receives to build Google API clients — no network
use happens in this repo itself.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class OAuthCredentials:
    client_id: str = ""
    client_secret: str = ""
    access_token: str = ""
    refresh_token: str = ""

    def get_client_id(self) -> str:
        return self.client_id

    def get_client_secret(self) -> str:
        return self.client_secret

    def get_access_token(self) -> str:
        return self.access_token

    def get_refresh_token(self) -> str:
        return self.refresh_token
