from .base import (AIR, MIRROR, AbbeMaterial, FormulaMaterial, IdealMaterial,
                   MaterialModel, Mirror, TabulatedMaterial)
from .catalog import catalog_names, glass, resolve_material
from .grin import GrinMaterial
from .dispersion import evaluate_formula, nair_edlen
from .environment import (EnvironmentalConditions, air_index,
                          ciddor_refractive_index, edlen_refractive_index,
                          birch_downs_refractive_index,
                          kohlrausch_refractive_index)

__all__ = ["AIR", "MIRROR", "AbbeMaterial", "FormulaMaterial", "IdealMaterial",
           "MaterialModel", "Mirror", "TabulatedMaterial", "GrinMaterial",
           "catalog_names",
           "glass", "resolve_material", "evaluate_formula", "nair_edlen",
           "EnvironmentalConditions", "air_index", "ciddor_refractive_index",
           "edlen_refractive_index", "birch_downs_refractive_index",
           "kohlrausch_refractive_index"]
