"""placeholder — populated in a later commit this round."""
