"""Model zoo ("lobes" analogue): SSL encoders, visual frontend, fusion blocks."""
