from .model import Graph, Segment, Link, Gap, GfaPath
