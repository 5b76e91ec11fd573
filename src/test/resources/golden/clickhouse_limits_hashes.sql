-- Golden contract: the EXACT SQL graft's JDBC tier emits against
-- ClickHouse for the reference's limits_hashes schema (hashes.go:25,
-- types per hashes_test.go:146). Reviewed against ClickHouse 23.3
-- syntax. Regenerate only for a DELIBERATE dialect change.

-- [create] DataFrameWriter JDBC path: dialect type mapping + the
-- deployment's createTableOptions (engine clause shown as a
-- representative MergeTree keyed like the reference's dedup key).
CREATE TABLE limits_hashes (`user_id` String , `amount` Int64 NOT NULL, `msg` String , `sha256sum` String ) ENGINE = MergeTree() ORDER BY `sha256sum`

-- [merge] StagedJdbcBatchSink delivery: ClickHouse has no MERGE; the
-- insert-if-absent idiom is a server-side anti-join INSERT.
INSERT INTO `limits_hashes` (`user_id`, `amount`, `msg`, `sha256sum`)
SELECT s.`user_id`, s.`amount`, s.`msg`, s.`sha256sum` FROM `limits_hashes_stage` AS s
LEFT ANTI JOIN `limits_hashes` AS t ON s.`sha256sum` = t.`sha256sum`

-- [gc] stage cleanup per batch: lightweight DELETE (ClickHouse >= 22.8).
DELETE FROM `limits_hashes_stage` WHERE `batch_id` = 7

-- [ansi-merge] the Derby-proven ANSI shape of the same delivery step,
-- pinned for contrast (JdbcBatcherSpec drives it live).
MERGE INTO "limits_hashes" t USING "limits_hashes_stage" s ON (t."sha256sum" = s."sha256sum")
WHEN NOT MATCHED THEN INSERT ("user_id", "amount", "msg", "sha256sum") VALUES (s."user_id", s."amount", s."msg", s."sha256sum")

-- [migrations-ledger] Migrations.up bootstrap on ClickHouse: ENGINE
-- clause + ordering key (the ANSI inline-PRIMARY-KEY form is
-- Derby-only; ClickHouse rejects it).
CREATE TABLE schema_migrations (
  version Int64,
  description String,
  applied_at DateTime64(3))
ENGINE = MergeTree() ORDER BY version

-- [mutation-delete] warehouse row mutation, lightweight form — the
-- exact statement shape the reference runs (hashes_test.go:237).
DELETE FROM `limits_hashes` WHERE `user_id` = 'test_user_001'

-- [mutation-alter-delete] the classic ALTER mutation for deployments
-- predating lightweight DELETE (< 22.8).
ALTER TABLE `limits_hashes` DELETE WHERE `user_id` = 'test_user_001'

-- [mutation-update] ClickHouse has no UPDATE statement; the only row
-- update is the ALTER TABLE mutation.
ALTER TABLE `limits_hashes` UPDATE `amount` = 0 WHERE `user_id` = 'test_user_001'
