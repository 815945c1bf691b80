from . import math as vmath  # noqa: F401
from . import vecmath, spectrum, colorspace, rng, image  # noqa: F401
