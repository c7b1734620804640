import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Ray Data's StatsManager flush thread races ray.shutdown(): a
    # flush landing after shutdown trips the core-worker "already been
    # shutdown" HARD EXIT, killing pytest mid-summary.  Shrink the
    # flush interval so the thread retires itself (interval ×
    # inactivity-limit) seconds after the last dataset, and join it in
    # teardown before shutting Ray down.
    from ray.data._internal.stats import StatsManager

    StatsManager.STATS_ACTOR_UPDATE_INTERVAL_SECONDS = 0.25
    yield
    # run lingering Dataset destructors while Ray is still alive —
    # same hard-exit if they fire post-shutdown
    import gc

    gc.collect()
    t = getattr(StatsManager, "_update_thread", None)
    if t is not None and t.is_alive():
        t.join(timeout=10)
    ray.shutdown()
