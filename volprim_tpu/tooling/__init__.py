"""Research tooling (reference ``scripts/`` tree, SURVEY.md §2.1 L4):
SH fitting, regularizers, samplers, dataset generation, radiance caching."""

from . import dataset
from . import energy_pmf
from . import radiance_cache
from . import regularizer
from . import sh_fit
