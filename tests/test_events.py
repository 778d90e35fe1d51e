"""Event-stream custom operators: sessionize / as-of join / range join."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con


def _compare(name, ray_df, sql):
    odf = _con().execute(sql).df()
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)) \
        .reset_index(drop=True)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b) > 0, name
    assert a.equals(b.astype(a.dtypes.to_dict())), name
    return a


class TestSessionize:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import events as ev

        a = _compare("sessionize", ev.sessionize(SF).to_pandas(),
                     ev.SESSIONIZE_SQL)
        # session ids start at 1 per user; seq restarts per session
        g = a.groupby("user_id")
        assert (g["session_id"].min() == 1).all()
        assert (a.groupby(["user_id", "session_id"])["session_seq"].min()
                == 1).all()

    def test_gap_semantics(self, ray_session):
        """A gap strictly greater than the threshold starts a new session."""
        from posm_ray.pipelines import events as ev

        a = ev.sessionize(SF).to_pandas()
        raw = _con().execute(
            "SELECT event_id, user_id, ts FROM events").df()
        m = a.merge(raw, on=["event_id", "user_id"]).sort_values(
            ["user_id", "ts", "event_id"])
        for _, g in list(m.groupby("user_id"))[:5]:
            gaps = g["ts"].diff()
            new = g["session_id"].diff().fillna(0) > 0
            expect = gaps > pd.Timedelta(minutes=ev.SESSION_GAP_MIN)
            assert (new[1:] == expect[1:]).all()


class TestAsofJoin:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import events as ev

        a = _compare("asof", ev.asof_prior_click(SF).to_pandas(),
                     ev.ASOF_PRIOR_CLICK_SQL)
        # click events match themselves (allow_exact_matches)
        raw = _con().execute(
            "SELECT event_id, event_type FROM events").df()
        m = a.merge(raw, on="event_id")
        clicks = m[m["event_type"] == "click"]
        assert (clicks["prior_click"] == clicks["event_id"]).all()


class TestRangeJoin:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import events as ev

        _compare("range", ev.value_range_join(SF).to_pandas(),
                 ev.value_range_join_sql())


class TestLateEvents:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import events as ev

        a = _compare("late", ev.late_events(SF).to_pandas(),
                     ev.LATE_EVENTS_SQL)
        assert a["is_late"].sum() > 0

    def test_scan_semantics(self, ray_session):
        """Only disorder-injected events can be late; nearly all of them
        are (90-min backshift vs 60-min lateness bound)."""
        from posm_ray.pipelines import events as ev

        a = ev.late_events(SF).to_pandas()
        late = a[a["is_late"]]
        assert (late["event_id"] % ev.DISORDER_MOD == 0).all()
        n_disordered = (a["event_id"] % ev.DISORDER_MOD == 0).sum()
        # sparser streams advance the watermark more per event, so fewer
        # backshifted events exceed the bound; half is the sf0.001 floor
        assert len(late) >= 0.4 * n_disordered


class TestSlidingWindow:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import events as ev

        a = _compare("sliding_window",
                     ev.sliding_window_counts(SF).to_pandas(),
                     ev.SLIDING_WINDOW_SQL)
        # every event counts at least itself; counts are bounded by the
        # user's total events
        assert (a["n_window"] >= 1).all()
        per_user = a.groupby("user_id")["event_id"].count()
        mx = a.groupby("user_id")["n_window"].max()
        assert (mx <= per_user.loc[mx.index]).all()
