from . import vecmath  # noqa: F401
from . import distribution  # noqa: F401
