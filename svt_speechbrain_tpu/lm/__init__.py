"""Language modelling: ARPA reading, back-off n-gram LM, counting."""
