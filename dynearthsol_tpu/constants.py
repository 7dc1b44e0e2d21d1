"""Dimension-dependent constants and boundary flags.

Mirrors the semantics of the reference's constants.hpp (DES3D
constants.hpp:12-95) but is runtime-parameterised on ``ndims`` instead of a
compile-time ``-DTHREED`` flag: one framework serves both 2D and 3D.
"""

import math
from dataclasses import dataclass

# Boundary indices (constants.hpp:27-38)
IBOUNDX0 = 0
IBOUNDX1 = 1
IBOUNDY0 = 2
IBOUNDY1 = 3
IBOUNDZ0 = 4
IBOUNDZ1 = 5
IBOUNDN0 = 6
IBOUNDN1 = 7
IBOUNDN2 = 8
IBOUNDN3 = 9
NBDRYTYPES = 10
NBDRYTYPES_HYDRO = 6

# Boundary bit flags (constants.hpp:42-52)
BOUNDX0 = 1 << IBOUNDX0  # 1, western (left in 2D)
BOUNDX1 = 1 << IBOUNDX1  # 2, eastern (right in 2D)
BOUNDY0 = 1 << IBOUNDY0  # 4, southern
BOUNDY1 = 1 << IBOUNDY1  # 8, northern
BOUNDZ0 = 1 << IBOUNDZ0  # 16, bottom
BOUNDZ1 = 1 << IBOUNDZ1  # 32, top
BOUNDN0 = 1 << IBOUNDN0  # 64, arbitrary-orientation boundaries
BOUNDN1 = 1 << IBOUNDN1  # 128
BOUNDN2 = 1 << IBOUNDN2  # 256
BOUNDN3 = 1 << IBOUNDN3  # 512
BOUND_ANY = (1 << NBDRYTYPES) - 1

YEAR2SEC = 365.2422 * 86400.0
DEG2RAD = math.pi / 180.0


@dataclass(frozen=True)
class Dim:
    """All dimension-derived sizes (constants.hpp:12-25,58-77)."""

    ndims: int

    @property
    def nodes_per_elem(self) -> int:
        return self.ndims + 1

    @property
    def nstr(self) -> int:
        """# of independent components of a symmetric tensor: 3 (2D), 6 (3D)."""
        return self.ndims * (self.ndims + 1) // 2

    @property
    def facets_per_elem(self) -> int:
        return self.ndims + 1

    @property
    def nodes_per_facet(self) -> int:
        return self.ndims

    @property
    def node_of_facet(self):
        """Local node indices of each facet (constants.hpp:63-75).

        3D: ordered counter-clockwise viewed from outside.
        2D: ordered counter-clockwise viewed from above.
        """
        if self.ndims == 3:
            return ((1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1))
        return ((1, 2), (2, 0), (0, 1))


DIM2 = Dim(2)
DIM3 = Dim(3)


def dim(ndims: int) -> Dim:
    if ndims == 2:
        return DIM2
    if ndims == 3:
        return DIM3
    raise ValueError(f"ndims must be 2 or 3, got {ndims}")
