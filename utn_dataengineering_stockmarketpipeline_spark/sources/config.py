"""Config / secret handling (SURVEY.md §2 S5, E3).

The reference reads ``config.ini`` sections ``API.TOKEN`` and ``DB.*``
(``API_manager.py:68-74``, ``DB_manager.py:20-26``) and — notably —
redacts the token when printing request params (``API_manager.py:57``).
Same surface here: ini file, environment-variable override (the
12-factor path a cluster deployment actually uses), and a redaction
helper so secrets never reach logs.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass

_ENV_PREFIX = "STOCKPIPE_"
REDACTED = "***"


@dataclass(frozen=True)
class Settings:
    api_token: str
    api_base_url: str
    db: dict[str, str]


def load_settings(path: str | None = None) -> Settings:
    """ini file (if given/present) with ``STOCKPIPE_*`` env overrides.

    Env wins over file — secrets belong in the environment on a
    cluster, not on a shared filesystem.
    """
    cp = configparser.ConfigParser()
    if path and os.path.exists(path):
        cp.read(path)
    token = os.environ.get(
        _ENV_PREFIX + "API_TOKEN", cp.get("API", "TOKEN", fallback="")
    )
    base = os.environ.get(
        _ENV_PREFIX + "API_BASE_URL",
        cp.get("API", "BASE_URL", fallback="https://eodhd.com/api"),
    )
    db = dict(cp.items("DB")) if cp.has_section("DB") else {}
    for k in list(db):
        db[k] = os.environ.get(_ENV_PREFIX + "DB_" + k.upper(), db[k])
    return Settings(api_token=token, api_base_url=base, db=db)


def redact(params: dict[str, str]) -> dict[str, str]:
    """E3: loggable copy of request params with secrets masked
    (mirrors the reference's token redaction, API_manager.py:57)."""
    hidden = {"api_token", "token", "password", "passwd", "secret"}
    return {
        k: (REDACTED if k.lower() in hidden and v else v)
        for k, v in params.items()
    }
