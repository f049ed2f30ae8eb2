"""Parser rule-pack data files (package so importlib.resources can read them
from a --py-files zip as well as a checkout)."""
