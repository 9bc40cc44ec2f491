"""Version / MappingFunction / ReferenceSystem — reference unit tests
ported from /root/reference/src/version.rs:113-160, src/mapf.rs:44-67,
src/system.rs:139-149."""

import pytest

from ionex_spark.core.meta import (
    DEFAULT_REFERENCE_SYSTEM,
    MappingFunction,
    ReferenceSystem,
    Version,
)


def test_version_parse_format():
    # src/version.rs:118-134
    for s, major, minor in [("1.0", 1, 0), ("1.2", 1, 2), ("2.0", 2, 0),
                            ("3.2", 3, 2)]:
        v = Version.parse(s)
        assert (v.major, v.minor) == (major, minor)
        assert str(v) == s
    # no-dot form parses as major only
    assert Version.parse("2") == Version(2, 0)
    with pytest.raises(ValueError):
        Version.parse("abc")


def test_version_comparison():
    # src/version.rs:137-142 ("3.02" minor parses as 2)
    a = Version.parse("1.2")
    b = Version.parse("3.02")
    assert b > a
    assert b != a
    assert b.minor == 2


def test_version_arithmetics():
    # src/version.rs:145-159 — major-only arithmetic, sub clamps at v1.x
    v = Version(3, 2)
    assert v + 1 == Version(4, 2)
    assert v + 2 == Version(5, 2)
    assert v - 2 == Version(1, 2)
    assert v - 3 == Version(1, 2)  # clamped
    assert v.as_tuple() == (3, 2)


def test_mapping_function_roundtrip():
    # src/mapf.rs:49-66 + the `cosine` alias (src/mapf.rs:27)
    for s in ("COSZ", "QFAC", "NONE"):
        assert MappingFunction.parse(s) == s
    assert MappingFunction.parse("cosine") == MappingFunction.COSZ
    assert MappingFunction.is_valid("COSZ")
    assert not MappingFunction.is_valid("WAT")
    with pytest.raises(ValueError):
        MappingFunction.parse("WAT")


def test_reference_system():
    # src/system.rs:139-149 — default is the Mixed constellation; GNSS
    # alias maps to Mixed (src/system.rs:128-130)
    assert DEFAULT_REFERENCE_SYSTEM.kind == "constellation"
    assert ReferenceSystem.parse("GNSS") == DEFAULT_REFERENCE_SYSTEM
    assert str(DEFAULT_REFERENCE_SYSTEM) == "GNSS"
    assert ReferenceSystem.parse("GPS").kind == "constellation"
    assert ReferenceSystem.parse("iri").kind == "other"
    assert ReferenceSystem.parse("top").kind == "model"
    with pytest.raises(ValueError):
        ReferenceSystem.parse("XYZ")
