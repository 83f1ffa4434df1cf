from .attention import causal_mask, dot_product_attention, padding_mask
