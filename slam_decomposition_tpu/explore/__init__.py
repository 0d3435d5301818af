"""Gate-exploration pipeline: candidate sweeps, speed-limit scaling, winner
selection, family extension, smush volumes."""
