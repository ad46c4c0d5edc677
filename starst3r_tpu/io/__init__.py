from .cache import PairCache, content_key
from .ply import save_ply, load_ply
