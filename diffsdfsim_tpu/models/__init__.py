from . import igr
from .igr import ImplicitNetParams, implicit_net_apply, make_decoder, init_implicit_net
