"""Dimension tables for the broadcast-enrich stage (FIXTURES.md §2).

Analog of the circuit-params lookup in the reference
(/root/reference/src/conf/circuit_params.yaml:4-23, loaded at
/root/reference/src/transform/position.py:40-57): a small keyed config
table applied to every row via a broadcast hash join.
"""

from __future__ import annotations

import pandas as pd

TOOLS = [
    "search",
    "browser",
    "python",
    "bash",
    "calculator",
    "file_read",
    "file_write",
    "sql",
    "http_get",
    "summarize",
    "translate",
    "image_gen",
]

_TOOL_FAMILY = {
    "search": "retrieval",
    "browser": "retrieval",
    "http_get": "retrieval",
    "python": "code",
    "bash": "code",
    "sql": "code",
    "calculator": "code",
    "file_read": "fs",
    "file_write": "fs",
    "summarize": "nlp",
    "translate": "nlp",
    "image_gen": "media",
}

_SENSITIVE = {"bash", "file_write", "http_get"}


def dim_roles_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "role": ["user", "assistant", "tool", "system"],
            "role_group": ["human", "model", "machine", "control"],
            "priority": [1, 2, 3, 0],
        }
    )


def dim_tools_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "tool": TOOLS,
            "tool_family": [_TOOL_FAMILY[t] for t in TOOLS],
            "is_sensitive": [t in _SENSITIVE for t in TOOLS],
        }
    )
