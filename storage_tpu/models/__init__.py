"""Price-process models: multi-factor simulation, trinomial trees."""
