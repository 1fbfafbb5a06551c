from .robot import RobotModel, indy7
from .urdf import parse_urdf

__all__ = ["RobotModel", "indy7", "parse_urdf"]
