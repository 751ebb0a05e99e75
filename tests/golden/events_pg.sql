SELECT cron.schedule('purge_stale_sessions', '0 0 * * *', $evt$DELETE FROM case_41_parent WHERE name = 'stale'$evt$);
SELECT cron.schedule('hourly_rollup', '0 * * * *', $evt$INSERT INTO case_41_parent (name) SELECT COALESCE(('roll-' || TO_CHAR(CURRENT_TIMESTAMP, 'YYYY-MM-DD')), 'x')$evt$);
-- SKIP [one_shot_cleanup]: CREATE EVENT one_shot_cleanup: one-shot AT '2030-01-01 00:00:00' has no pg_cron analog (cron entries recur) — run the body once manually
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
