"""Configuration and support utilities: mode tables, band plans, state
files, frequency parsing (reference: modes.c, bandplan.c, main.c state
save/load, display.c parse_frequency)."""

from .modes import ModeDef, parse_modes, DEFAULT_MODES, load_modes
from .misc import parse_frequency, db2voltage, voltage2db, power2db, db2power
