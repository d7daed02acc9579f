from artist_tpu.scenario.scenario import Scenario, load_scenario_from_hdf5  # noqa: F401
