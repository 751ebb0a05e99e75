SELECT cron.schedule('purge_stale_sessions', '0 0 * * *', $evt$DELETE FROM case_41_parent WHERE name = 'stale'$evt$);
SELECT cron.schedule('hourly_rollup', '0 * * * *', $evt$INSERT INTO case_41_parent (name) SELECT COALESCE(('roll-' || TO_CHAR(CURRENT_TIMESTAMP, 'YYYY-MM-DD')), 'x')$evt$);
SELECT cron.schedule('one_shot_cleanup', '0 0 1 1 *', $evt$DO $do$ BEGIN IF now() >= TIMESTAMP '2030-01-01 00:00:00' - interval '14 hours' THEN DELETE FROM case_41_parent WHERE name = 'tmp'; PERFORM cron.unschedule('one_shot_cleanup'); END IF; END $do$$evt$);
-- NOTE [one_shot_cleanup]: event one_shot_cleanup: one-shot AT '2030-01-01 00:00:00' emulated via pg_cron's self-unschedule idiom (year-guarded DO block — cron has no year field; the guard carries a 14 h tolerance for cron.timezone vs session TimeZone skew) — the job fires at the first wall-clock match at-or-after the timestamp and removes itself; if the server is down at that minute it fires at the NEXT yearly match, where MySQL would have dropped a missed one-shot
-- SKIP [odd_cadence]: CREATE EVENT odd_cadence: EVERY 7 MINUTE: 60 % 7 != 0 — cron's hour boundary would break the cadence — not migrated
CREATE OR REPLACE PROCEDURE nightly_compound_evt_job()
AS $$
DECLARE
BEGIN
    DELETE FROM case_41_parent WHERE name = 'a';
    DELETE FROM case_41_parent WHERE name = 'b';
END;
$$ LANGUAGE plpgsql;
SELECT cron.schedule('nightly_compound', '0 0 * * *', $evt$CALL nightly_compound_evt_job()$evt$);
SELECT cron.schedule('bounded_window', '15 * * * *', $evt$DELETE FROM case_41_parent WHERE name = 'window'$evt$);
SELECT cron.schedule('bounded_window_ends', '0 0 1 6 *', $evt$DO $do$ BEGIN IF now() >= TIMESTAMP '2026-06-01 00:00:00' - interval '14 hours' THEN PERFORM cron.unschedule('bounded_window'); PERFORM cron.unschedule('bounded_window_ends'); END IF; END $do$$evt$);
-- NOTE [bounded_window]: event bounded_window: ENDS '2026-06-01 00:00:00' emulated via a second self-unscheduling one-shot (year-guarded DO block — cron has no year field; the guard carries a 14 h tolerance for cron.timezone vs session TimeZone skew) that removes the job at the first wall-clock match at-or-after the ENDS time; a server down at that minute delays the removal to the next yearly match
