from .json_io import (optic_to_dict, optic_from_dict, save_optiland_file,
                      load_optiland_file, save_optic, load_optic)
from .zemax import load_zemax_file, ZemaxFileReader
from .autolens import (optic_to_autolens, autolens_to_optic,
                       save_autolens_file, load_autolens_file)

__all__ = ["optic_to_dict", "optic_from_dict", "save_optiland_file",
           "load_optiland_file", "save_optic", "load_optic",
           "load_zemax_file", "ZemaxFileReader",
           "optic_to_autolens", "autolens_to_optic", "save_autolens_file",
           "load_autolens_file"]
