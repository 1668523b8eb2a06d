from .gfa import read_gfa, parse_gfa_lines
from .stream import open_input, OutputStream, STDOUT_EXTS
