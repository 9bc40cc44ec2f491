"""IONEX header metadata value types: Version, MappingFunction,
ReferenceSystem.

Behavioral spec: /root/reference/src/version.rs:30-90 (clamped +/- major
arithmetic, `major[.minor]` parse), src/mapf.rs:9-41 (NONE/COSZ/QFAC with
the `cosine` alias), src/system.rs:9-137 (constellation / other-system /
theoretical-model reference systems).  Re-derived from the IONEX 1.0
header field definitions; the reference's unit tests are ported to
tests/test_core_meta.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import total_ordering


@total_ordering
@dataclass(frozen=True)
class Version:
    """IONEX file revision (src/version.rs).

    Arithmetic operates on the MAJOR number only and subtraction clamps
    at v1.x (there is no IONEX v0)."""

    major: int = 1
    minor: int = 0

    @classmethod
    def parse(cls, s: str) -> "Version":
        s = s.strip()
        if "." in s:
            maj, minor = s.split(".", 1)
            return cls(int(maj), int(minor))
        return cls(int(s), 0)

    def __str__(self) -> str:
        return f"{self.major}.{self.minor}"

    def __lt__(self, other: "Version") -> bool:
        return (self.major, self.minor) < (other.major, other.minor)

    def __add__(self, major: int) -> "Version":
        return Version(self.major + major, self.minor)

    def __sub__(self, major: int) -> "Version":
        if major >= self.major:
            return Version(1, self.minor)  # clamp @ v1.x
        return Version(self.major - major, self.minor)

    def as_tuple(self) -> tuple[int, int]:
        return (self.major, self.minor)


class MappingFunction:
    """TEC mapping function enum (src/mapf.rs:9-41): NONE, COSZ (1/cos z),
    QFAC.  ``parse`` accepts the reference's `cosine` alias; ``format`` is
    the canonical marker spelling."""

    NONE = "NONE"
    COSZ = "COSZ"
    QFAC = "QFAC"
    _ALIASES = {"NONE": NONE, "COSZ": COSZ, "cosine": COSZ, "QFAC": QFAC}

    @classmethod
    def parse(cls, s: str) -> str:
        try:
            return cls._ALIASES[s.strip()]
        except KeyError:
            raise ValueError(f"unknown mapping function: {s!r}") from None

    @classmethod
    def is_valid(cls, s: str) -> bool:
        return s.strip() in cls._ALIASES


# GNSS constellation codes the reference resolves via the gnss-rs crate's
# Constellation::from_str (RINEX constellation names); "GNSS" maps to
# Mixed per src/system.rs:128-130.
_CONSTELLATIONS = {
    "GPS": "GPS",
    "GLO": "GLO",
    "GLONASS": "GLO",
    "GAL": "GAL",
    "GALILEO": "GAL",
    "BDS": "BDS",
    "BEIDOU": "BDS",
    "QZSS": "QZSS",
    "IRNSS": "IRNSS",
    "NAVIC": "IRNSS",
    "SBAS": "SBAS",
    "GNSS": "MIXED",
    "MIXED": "MIXED",
}
_OTHER_SYSTEMS = {"BEN": "BEN", "ENV": "ENV", "ERS": "ERS", "IRI": "IRI"}
_THEORETICAL_MODELS = {"MIX": "MIX", "NNS": "NNS", "TOP": "TOP"}


@dataclass(frozen=True)
class ReferenceSystem:
    """IONEX reference system (src/system.rs): the observation source of
    the TEC maps — a GNSS constellation, another Earth-observation
    system (BENt/ENVisat/ERS/IRI), or a theoretical model (MIX/NNS/TOP).

    kind is one of 'constellation' | 'other' | 'model'."""

    kind: str
    name: str

    @classmethod
    def parse(cls, s: str) -> "ReferenceSystem":
        u = s.strip().upper()
        if u in _CONSTELLATIONS:
            return cls("constellation", _CONSTELLATIONS[u])
        if u in _OTHER_SYSTEMS:
            return cls("other", _OTHER_SYSTEMS[u])
        if u in _THEORETICAL_MODELS:
            return cls("model", _THEORETICAL_MODELS[u])
        raise ValueError(f"unknown reference system: {s!r}")

    def __str__(self) -> str:
        return "GNSS" if self.name == "MIXED" else self.name


DEFAULT_REFERENCE_SYSTEM = ReferenceSystem("constellation", "MIXED")
