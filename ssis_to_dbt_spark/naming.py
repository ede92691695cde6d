"""Column-name normalization (snake_case).

Semantics match the reference's ``to_snake_case``
(/root/reference/src/parser/type_mappings.py:141-157, asserted by
/root/reference/tests/test_type_mappings.py:127-155): CamelCase and acronym
boundaries get underscores, spaces/hyphens become underscores, everything is
lowered, runs of underscores collapse.
"""

from __future__ import annotations

import re

_ACRONYM_BOUNDARY = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL_BOUNDARY = re.compile(r"([a-z\d])([A-Z])")
_SEPARATORS = re.compile(r"[\s\-]+")
_MULTI_UNDERSCORE = re.compile(r"_+")


def to_snake_case(name: str) -> str:
    """``CustomerID`` -> ``customer_id``; ``OrderXMLData`` -> ``order_xml_data``."""
    s = _SEPARATORS.sub("_", name.strip())
    s = _ACRONYM_BOUNDARY.sub(r"\1_\2", s)
    s = _CAMEL_BOUNDARY.sub(r"\1_\2", s)
    s = _MULTI_UNDERSCORE.sub("_", s)
    return s.strip("_").lower()


_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def validate_identifier(name: str) -> str:
    """Reject names that could smuggle SQL (reference: type_mappings.py:102-138)."""
    if not _IDENTIFIER.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name
