"""Host-side analysis helpers (ports of the reference's utils/*.py)."""

from . import geotherm, gravity, terrigenous  # noqa: F401
