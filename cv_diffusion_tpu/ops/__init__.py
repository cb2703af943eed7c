from .attention import linear_attention, standard_attention, elu_plus_one
from .norms import group_norm, group_norm_film, gn_num_groups
