"""Task engines: trainer / validator / predictor (maps reference ultralytics/engine/)."""
