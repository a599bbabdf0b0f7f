"""I/O layer (L4): HDF5 kinematics files, Spyral cloud files, converters."""

from .kinematics_file import KinematicsWriter, KinematicsReader

__all__ = ["KinematicsWriter", "KinematicsReader"]
