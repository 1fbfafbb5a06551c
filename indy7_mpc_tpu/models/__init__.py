import os

from .robot import RobotModel, indy7
from .urdf import parse_urdf
from .mjcf import indy7_mjcf, mjcf_meta, parse_mjcf

#: Vendored robot description (copied from the reference's
#: description/indy7.urdf:1-369 and indy7.xml:1-77 — physical robot data,
#: vendored so the framework is self-contained).
DESCRIPTION_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "description"
)
INDY7_URDF = os.path.join(DESCRIPTION_DIR, "indy7.urdf")
INDY7_MJCF = os.path.join(DESCRIPTION_DIR, "indy7.xml")


def indy7_from_urdf(dtype=None) -> RobotModel:
    """Build the Indy7 model by parsing the vendored URDF (round-trip of
    the embedded parameters in :func:`indy7`)."""
    return parse_urdf(INDY7_URDF, dtype=dtype)


__all__ = [
    "RobotModel",
    "indy7",
    "indy7_from_urdf",
    "indy7_mjcf",
    "parse_urdf",
    "parse_mjcf",
    "mjcf_meta",
    "INDY7_URDF",
    "INDY7_MJCF",
    "DESCRIPTION_DIR",
]
