-- GOLDEN: complete PostgreSQL DDL plan for the reference
-- fixture corpus (scripts/mysql/*.sql), emitted by plan() in
-- PG dialect. Regenerate: python tools/dump_corpus_ddl.py

-- ==== stage: tableddl ====

CREATE TABLE IF NOT EXISTS case_01_integers (
  col_tiny SMALLINT,
  col_small SMALLINT,
  col_medium INTEGER,
  col_int INTEGER,
  col_integer INTEGER,
  col_big BIGINT,
  col_int_prec INTEGER,
  col_big_prec BIGINT
);

CREATE TABLE IF NOT EXISTS case_02_boolean (
  is_active BOOLEAN,
  status SMALLINT,
  is_deleted BOOLEAN
);

CREATE TABLE IF NOT EXISTS case_03_floats (
  col_float REAL,
  col_float_p REAL,
  col_float_ps REAL,
  col_double DOUBLE PRECISION,
  col_double_ps DOUBLE PRECISION,
  col_decimal DECIMAL(10,2),
  col_numeric DECIMAL(10,2),
  col_real DOUBLE PRECISION
);

CREATE TABLE IF NOT EXISTS case_04_mb3_suffix (
  col_var_mb3 VARCHAR(255),
  col_char_mb3 CHAR(10),
  col_text_mb3 TEXT,
  col_mixed_mb3 VARCHAR(100)
);

CREATE TABLE IF NOT EXISTS case_05_charsets (
  c1 VARCHAR(20),
  c2 VARCHAR(20),
  c3 VARCHAR(20),
  c4 VARCHAR(20),
  c5 VARCHAR(20),
  c6 VARCHAR(20)
);

CREATE TABLE IF NOT EXISTS case_06_collates (
  c1 VARCHAR(20),
  c2 VARCHAR(20),
  c3 VARCHAR(20),
  c4 VARCHAR(20),
  c5 VARCHAR(20)
);

CREATE TABLE IF NOT EXISTS case_07_complex_charsets (
  c1 CHAR(10),
  c2 VARCHAR(10),
  c3 CHAR(10)
);

CREATE TABLE IF NOT EXISTS case_08_json (
  data JSON,
  data_len JSON,
  data_upper JSON
);

CREATE TABLE IF NOT EXISTS case_09_datetime (
  d1 DATE,
  t1 TIME,
  t2 TIME(6),
  dt1 TIMESTAMP,
  dt2 TIMESTAMP(3),
  ts1 TIMESTAMP,
  ts2 TIMESTAMP(6),
  y1 INTEGER
);

CREATE TABLE IF NOT EXISTS case_10_defaults (
  c1 INTEGER DEFAULT 0,
  c2 INTEGER DEFAULT 1,
  c3 VARCHAR(10) DEFAULT 'abc',
  c4 TIMESTAMP(3) DEFAULT CURRENT_TIMESTAMP,
  c5 TIMESTAMP(6) DEFAULT CURRENT_TIMESTAMP,
  c6 TIMESTAMP(3) DEFAULT CURRENT_TIMESTAMP
);

CREATE TABLE IF NOT EXISTS case_11_autoincrement (
  id SERIAL,
  big_id BIGINT,
  mixed_case INTEGER
);

CREATE TABLE IF NOT EXISTS case_12_unsigned (
  c1 BIGINT,
  c2 NUMERIC(20,0),
  c3 INTEGER,
  c4 BIGINT
);

CREATE TABLE IF NOT EXISTS case_13_enum_set (
  e1 VARCHAR(255),
  s1 VARCHAR(255)
);

CREATE TABLE IF NOT EXISTS case_14_binary (
  b1 BYTEA,
  b2 BYTEA,
  b3 BYTEA,
  b4 BYTEA,
  b5 BYTEA,
  b6 BYTEA
);

CREATE TABLE IF NOT EXISTS case_15_options (
  id INTEGER
);

CREATE TABLE IF NOT EXISTS case_16_partition (
  id INTEGER,
  created_at TIMESTAMP
) PARTITION BY RANGE ((EXTRACT(YEAR FROM created_at)));

CREATE TABLE IF NOT EXISTS case_16_partition_p0 PARTITION OF case_16_partition FOR VALUES FROM (MINVALUE) TO (2020);

CREATE TABLE IF NOT EXISTS case_16_partition_p1 PARTITION OF case_16_partition FOR VALUES FROM (2020) TO (2021);

CREATE TABLE IF NOT EXISTS case_18_quotes (
  id INTEGER,
  name VARCHAR(20),
  "desc" TEXT
);

CREATE TABLE IF NOT EXISTS case_19_comments (
  c1 INTEGER,
  c2 INTEGER,
  c3 INTEGER,
  c4 INTEGER
);

COMMENT ON TABLE case_19_comments IS 'Table comment';

COMMENT ON COLUMN case_19_comments.c1 IS 'Simple comment';

COMMENT ON COLUMN case_19_comments.c3 IS 'Comment with '' quote';

CREATE TABLE IF NOT EXISTS case_20_constraints (
  id INTEGER,
  name VARCHAR(20),
  PRIMARY KEY (id)
);

CREATE TABLE IF NOT EXISTS case_21_virtual (
  id INTEGER,
  c1 INTEGER,
  c2 INTEGER GENERATED ALWAYS AS (c1 + 1) STORED
);

CREATE TABLE IF NOT EXISTS case_22_spatial (
  g TEXT,
  p POINT,
  ls TEXT,
  poly TEXT,
  mp TEXT,
  mls TEXT,
  mpoly TEXT,
  gc TEXT
);

CREATE TABLE IF NOT EXISTS case_23_weird_syntax (
  c1 INTEGER,
  c2 DOUBLE PRECISION,
  c3 TEXT,
  c4 BIGINT,
  c5 SMALLINT
);

CREATE TABLE IF NOT EXISTS case_24_edge_cases (
  c1 TEXT,
  c2 VARCHAR(255),
  c3 INTEGER,
  c4 NUMERIC(20,0) NOT NULL,
  c5 DOUBLE PRECISION,
  c6 BYTEA
);

CREATE TABLE IF NOT EXISTS case_25_mysql8_reserved (
  id INTEGER,
  "rank" INTEGER,
  "system" VARCHAR(10),
  "groups" TEXT,
  "window" VARCHAR(20),
  "function" INTEGER,
  "role" VARCHAR(10),
  "admin" BOOLEAN
);

CREATE TABLE IF NOT EXISTS case_26_mysql8_invisible (
  id INTEGER,
  c1 INTEGER,
  c2 INTEGER
);

CREATE TABLE IF NOT EXISTS case_27_mysql8_check (
  id INTEGER,
  age INTEGER
);

CREATE TABLE IF NOT EXISTS case_28_mysql8_func_index (
  data JSON,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_29_mysql8_defaults (
  id CHAR(36),
  val INTEGER,
  j JSON
);

CREATE TABLE IF NOT EXISTS case_30_mysql8_collations (
  c1 VARCHAR(10),
  c2 VARCHAR(10),
  c3 VARCHAR(10)
);

CREATE TABLE IF NOT EXISTS case_31_sys_utf8mb3 (
  host CHAR(255) NOT NULL DEFAULT '',
  db CHAR(64) NOT NULL DEFAULT '',
  "user" CHAR(32) NOT NULL DEFAULT ''
);

COMMENT ON TABLE case_31_sys_utf8mb3 IS 'System table imitation';

CREATE TABLE IF NOT EXISTS case_32_complex_generated (
  cost_name VARCHAR(64) NOT NULL,
  default_value REAL GENERATED ALWAYS AS ((case cost_name when 'io_block_read_cost' then 1.0 else NULL end)) STORED
);

CREATE TABLE IF NOT EXISTS case_33_desc_index (
  host CHAR(255),
  "user" CHAR(32),
  password_timestamp TIMESTAMP(6),
  PRIMARY KEY (host, "user", password_timestamp)
);

CREATE TABLE IF NOT EXISTS case_34_table_options (
  id INTEGER
);

CREATE TABLE IF NOT EXISTS case_35_enum_charset (
  col_enum VARCHAR(255) NOT NULL DEFAULT 'N',
  col_set VARCHAR(255) NOT NULL DEFAULT ''
);

CREATE TABLE IF NOT EXISTS case_36_uppercase (
  id INTEGER,
  name VARCHAR(50),
  age INTEGER,
  email VARCHAR(100),
  create_date TIMESTAMP
);

CREATE TABLE IF NOT EXISTS case_37_hump (
  productid INTEGER,
  productname VARCHAR(100),
  price DECIMAL(10,2),
  stock INTEGER,
  category VARCHAR(50),
  lastupdate TIMESTAMP
);

CREATE TABLE IF NOT EXISTS case_38_snake (
  product_id INTEGER,
  product_name VARCHAR(100),
  price DECIMAL(10,2),
  stock INTEGER,
  category VARCHAR(50),
  last_update TIMESTAMP
);

CREATE TABLE IF NOT EXISTS case_39_underscore (
  product_id INTEGER,
  product_name VARCHAR(100),
  price DECIMAL(10,2),
  stock INTEGER,
  category VARCHAR(50),
  last_update TIMESTAMP
);

CREATE TABLE IF NOT EXISTS case_40_default (
  id INTEGER,
  name VARCHAR(50) DEFAULT 'unknown',
  age INTEGER DEFAULT 0,
  email VARCHAR(100) DEFAULT 'unknown@example.com'
);

CREATE TABLE IF NOT EXISTS case_41_parent (
  id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_41_foreign_key (
  id INTEGER,
  parent_id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_42_fulltext (
  id INTEGER,
  title VARCHAR(100),
  content TEXT
);

CREATE TABLE IF NOT EXISTS case_43_spatial_index (
  id INTEGER,
  location POINT
);

CREATE TABLE IF NOT EXISTS case_44_composite_pk (
  id1 INTEGER,
  id2 INTEGER,
  name VARCHAR(50),
  PRIMARY KEY (id1, id2)
);

CREATE TABLE IF NOT EXISTS case_45_stored_generated (
  id INTEGER,
  c1 INTEGER,
  c2 INTEGER GENERATED ALWAYS AS (c1 * 2) STORED,
  c3 INTEGER GENERATED ALWAYS AS (c1 + (c1 * 2)) STORED
);

CREATE TABLE IF NOT EXISTS case_46_myisam (
  id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_47_memory (
  id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_48_index_types (
  id INTEGER,
  name VARCHAR(50),
  value INTEGER
);

CREATE TABLE IF NOT EXISTS case_49_list_partition (
  id INTEGER,
  category INTEGER
) PARTITION BY LIST (category);

CREATE TABLE IF NOT EXISTS case_49_list_partition_p0 PARTITION OF case_49_list_partition FOR VALUES IN (1, 2, 3);

CREATE TABLE IF NOT EXISTS case_49_list_partition_p1 PARTITION OF case_49_list_partition FOR VALUES IN (4, 5, 6);

CREATE TABLE IF NOT EXISTS case_50_hash_partition (
  id INTEGER,
  name VARCHAR(50)
) PARTITION BY HASH (id);

CREATE TABLE IF NOT EXISTS case_50_hash_partition_p0 PARTITION OF case_50_hash_partition FOR VALUES WITH (MODULUS 4, REMAINDER 0);

CREATE TABLE IF NOT EXISTS case_50_hash_partition_p1 PARTITION OF case_50_hash_partition FOR VALUES WITH (MODULUS 4, REMAINDER 1);

CREATE TABLE IF NOT EXISTS case_50_hash_partition_p2 PARTITION OF case_50_hash_partition FOR VALUES WITH (MODULUS 4, REMAINDER 2);

CREATE TABLE IF NOT EXISTS case_50_hash_partition_p3 PARTITION OF case_50_hash_partition FOR VALUES WITH (MODULUS 4, REMAINDER 3);

-- NOTE [case_50_hash_partition]: table case_50_hash_partition: HASH partitioning migrated with modulus 4, but row→partition placement

CREATE TABLE IF NOT EXISTS case_53_deferred_constraint (
  id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_54_tablespace (
  id INTEGER,
  name VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_55_compressed (
  id INTEGER,
  data TEXT
);

CREATE TABLE IF NOT EXISTS case_56_encrypted (
  id INTEGER,
  sensitive_data VARCHAR(100)
);

CREATE TABLE IF NOT EXISTS case_57_column_privileges (
  id INTEGER,
  public_data VARCHAR(50),
  sensitive_data VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_58_subpartition (
  id INTEGER,
  year INTEGER,
  month INTEGER
) PARTITION BY RANGE (year);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020 PARTITION OF case_58_subpartition FOR VALUES FROM (MINVALUE) TO (2021) PARTITION BY HASH (month);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s0 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 0);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s1 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 1);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s2 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 2);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s3 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 3);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s4 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 4);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s5 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 5);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s6 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 6);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s7 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 7);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s8 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 8);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s9 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 9);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s10 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 10);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2020_s11 PARTITION OF case_58_subpartition_p2020 FOR VALUES WITH (MODULUS 12, REMAINDER 11);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021 PARTITION OF case_58_subpartition FOR VALUES FROM (2021) TO (2022) PARTITION BY HASH (month);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s0 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 0);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s1 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 1);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s2 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 2);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s3 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 3);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s4 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 4);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s5 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 5);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s6 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 6);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s7 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 7);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s8 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 8);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s9 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 9);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s10 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 10);

CREATE TABLE IF NOT EXISTS case_58_subpartition_p2021_s11 PARTITION OF case_58_subpartition_p2021 FOR VALUES WITH (MODULUS 12, REMAINDER 11);

-- NOTE [case_58_subpartition]: table case_58_subpartition: HASH subpartitioning migrated as nested PARTITION BY HASH × 12, but row→

CREATE TABLE IF NOT EXISTS case_59_complex_generated (
  id INTEGER,
  price DECIMAL(10,2),
  quantity INTEGER,
  discount DECIMAL(5,2),
  subtotal DECIMAL(12,2) GENERATED ALWAYS AS ((price * quantity)) STORED,
  total DECIMAL(12,2) GENERATED ALWAYS AS ((price * quantity) * (1 - discount / 100)) STORED,
  formatted_total VARCHAR(50)
);

CREATE TABLE IF NOT EXISTS case_60_statistics (
  id INTEGER,
  category VARCHAR(50),
  subcategory VARCHAR(50),
  value DECIMAL(10,2)
);

CREATE TABLE IF NOT EXISTS case_61_many_columns (
  id INTEGER,
  tinyint_min SMALLINT,
  tinyint_max SMALLINT,
  smallint_min SMALLINT,
  smallint_max SMALLINT,
  mediumint_min INTEGER,
  mediumint_max INTEGER,
  int_min INTEGER,
  int_max INTEGER,
  bigint_min BIGINT,
  bigint_max BIGINT,
  float_min REAL,
  float_max REAL,
  double_min DOUBLE PRECISION,
  double_max DOUBLE PRECISION,
  decimal_min DECIMAL(1,0),
  decimal_max DECIMAL(65,30),
  char_min CHAR(1),
  char_max CHAR(255),
  varchar_min VARCHAR(1),
  varchar_max VARCHAR(255),
  text_min TEXT,
  text_max TEXT,
  tinytext_min TEXT,
  tinytext_max TEXT,
  mediumtext_min TEXT,
  mediumtext_max TEXT,
  longtext_min TEXT,
  longtext_max TEXT,
  binary_min BYTEA,
  binary_max BYTEA,
  varbinary_min BYTEA,
  varbinary_max BYTEA,
  blob_min BYTEA,
  blob_max BYTEA,
  tinyblob_min BYTEA,
  tinyblob_max BYTEA,
  mediumblob_min BYTEA,
  mediumblob_max BYTEA,
  longblob_min BYTEA,
  longblob_max BYTEA,
  date_col DATE,
  time_col TIME,
  datetime_col TIMESTAMP,
  timestamp_col TIMESTAMP,
  year_col INTEGER,
  boolean_col BOOLEAN,
  enum_min VARCHAR(255),
  enum_max VARCHAR(255),
  set_min VARCHAR(255),
  set_max VARCHAR(255),
  json_col JSON
);

CREATE TABLE IF NOT EXISTS case_62_various_defaults (
  id SERIAL,
  name VARCHAR(50) DEFAULT 'Unknown',
  age INTEGER DEFAULT 18,
  active BOOLEAN DEFAULT true,
  created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
  updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
  price DECIMAL(10,2) DEFAULT 0.00,
  quantity INTEGER DEFAULT 1,
  status VARCHAR(20) DEFAULT 'pending',
  data JSON,
  uuid CHAR(36)
);

CREATE TABLE IF NOT EXISTS case_63_charset_collation (
  id INTEGER,
  name_en VARCHAR(50),
  name_zh VARCHAR(50),
  name_de VARCHAR(50),
  code VARCHAR(10)
);

-- ==== stage: view ====

DROP VIEW IF EXISTS view_case01_integers CASCADE; CREATE OR REPLACE VIEW view_case01_integers AS SELECT 
    i.col_tiny AS "rank",
    i.col_small AS "system",
    i.col_medium AS "groups",
    i.col_int AS "window",
    i.col_integer AS "function",
    i.col_big AS "role",
    i.col_int_prec AS "admin",
    i.col_big_prec AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    f.col_double AS "double_value",
    f.col_decimal AS "decimal_value",
    CASE 
        WHEN i.col_tiny > 0 THEN 'positive'
        WHEN i.col_tiny < 0 THEN 'negative'
        ELSE 'zero'
    END AS "case_result",
    COALESCE(i.col_small, 0) AS "ifnull_result",
    COALESCE(i.col_medium, i.col_int, 0) AS "coalesce_result",
    CONCAT('Value: ', i.col_integer) AS "concat_result",
    LENGTH(CAST(i.col_big AS TEXT)) AS "length_result",
    SUBSTRING(CAST(i.col_int_prec AS TEXT), 1, 5) AS "substring_result",
    ROUND(CAST(i.col_big_prec AS NUMERIC), 2) AS "round_result",
    CEIL(CAST(i.col_tiny AS NUMERIC)) AS "ceil_result",
    FLOOR(CAST(i.col_small AS NUMERIC)) AS "floor_result",
    ABS(CAST(i.col_medium AS NUMERIC)) AS "abs_result",
    MOD(CAST(i.col_int AS NUMERIC), CAST(10 AS NUMERIC)) AS "mod_result",
    POWER(CAST(i.col_integer AS NUMERIC), CAST(2 AS NUMERIC)) AS "power_result",
    SQRT(CAST(i.col_big AS NUMERIC)) AS "sqrt_result",
    SIN(CAST(i.col_int_prec AS NUMERIC)) AS "sin_result",
    COS(CAST(i.col_big_prec AS NUMERIC)) AS "cos_result",
    TAN(CAST(i.col_tiny AS NUMERIC)) AS "tan_result",
    LN(i.col_small) AS "log_result",
    EXP(CAST(i.col_medium AS NUMERIC)) AS "exp_result",
    GREATEST(CAST(i.col_int AS NUMERIC), CAST(i.col_integer AS NUMERIC), CAST(i.col_big AS NUMERIC)) AS "greatest_result",
    LEAST(CAST(i.col_int AS NUMERIC), CAST(i.col_integer AS NUMERIC), CAST(i.col_big AS NUMERIC)) AS "least_result",
    STRPOS(CAST(i.col_big_prec AS TEXT), CAST('5' AS TEXT)) AS "instr_result",
    REPLACE(CAST(i.col_int_prec AS TEXT), CAST('1' AS TEXT), CAST('0' AS TEXT)) AS "replace_result",
    TRIM(CAST(i.col_small AS TEXT)) AS "trim_result",
    UPPER(CAST(i.col_medium AS TEXT)) AS "upper_result",
    LOWER(CAST(i.col_int AS TEXT)) AS "lower_result",
    REVERSE(CAST(i.col_integer AS TEXT)) AS "reverse_result",
    LEFT(CAST(i.col_big AS TEXT), 5) AS "left_result",
    RIGHT(CAST(i.col_int_prec AS TEXT), 5) AS "right_result",
    SUBSTRING(CAST(i.col_big_prec AS TEXT), 2, 3) AS "mid_result"
FROM 
    case_01_integers i
LEFT JOIN 
    case_02_boolean b ON i.col_tiny = b.status
LEFT JOIN 
    case_03_floats f ON i.col_small = CAST(f.col_float AS BIGINT);

DROP VIEW IF EXISTS view_case02_boolean CASCADE; CREATE OR REPLACE VIEW view_case02_boolean AS SELECT 
    b.is_active AS "rank",
    b.status AS "system",
    b.is_deleted AS "groups",
    i.col_tiny AS "window",
    i.col_small AS "function",
    i.col_medium AS "role",
    i.col_int AS "admin",
    i.col_integer AS "user",
    f.col_float AS "float_value",
    f.col_double AS "double_value",
    f.col_decimal AS "decimal_value",
    CASE 
        WHEN b.is_active = 1 THEN 'active'
        ELSE 'inactive'
    END AS "case_result",
    COALESCE(b.status, 0) AS "ifnull_result",
    COALESCE(b.is_deleted, b.is_active, 0) AS "coalesce_result",
    CONCAT('Status: ', b.status) AS "concat_result",
    LENGTH(CAST(b.status AS TEXT)) AS "length_result",
    SUBSTRING(CAST(b.status AS TEXT), 1, 2) AS "substring_result",
    ROUND(CAST(b.is_active AS NUMERIC), 2) AS "round_result",
    CEIL(CAST(b.status AS NUMERIC)) AS "ceil_result",
    FLOOR(CAST(b.is_active AS NUMERIC)) AS "floor_result",
    ABS(CAST(b.status AS NUMERIC)) AS "abs_result",
    MOD(CAST(b.status AS NUMERIC), CAST(2 AS NUMERIC)) AS "mod_result",
    POWER(CAST(b.is_active AS NUMERIC), CAST(2 AS NUMERIC)) AS "power_result",
    SQRT(CAST(b.status AS NUMERIC)) AS "sqrt_result",
    SIN(CAST(b.is_deleted AS NUMERIC)) AS "sin_result",
    COS(CAST(b.status AS NUMERIC)) AS "cos_result",
    TAN(CAST(b.is_active AS NUMERIC)) AS "tan_result",
    LN(b.status) AS "log_result",
    EXP(CAST(b.is_active AS NUMERIC)) AS "exp_result",
    GREATEST(CAST(b.is_active AS NUMERIC), CAST(b.status AS NUMERIC), CAST(b.is_deleted AS NUMERIC)) AS "greatest_result",
    LEAST(CAST(b.is_active AS NUMERIC), CAST(b.status AS NUMERIC), CAST(b.is_deleted AS NUMERIC)) AS "least_result",
    STRPOS(CAST(b.status AS TEXT), CAST('1' AS TEXT)) AS "instr_result",
    REPLACE(CAST(b.status AS TEXT), CAST('0' AS TEXT), CAST('1' AS TEXT)) AS "replace_result",
    TRIM(CAST(b.status AS TEXT)) AS "trim_result",
    UPPER(CAST(b.status AS TEXT)) AS "upper_result",
    LOWER(CAST(b.status AS TEXT)) AS "lower_result",
    REVERSE(CAST(b.status AS TEXT)) AS "reverse_result",
    LEFT(CAST(b.status AS TEXT), 1) AS "left_result",
    RIGHT(CAST(b.status AS TEXT), 1) AS "right_result",
    SUBSTRING(CAST(b.status AS TEXT), 1, 1) AS "mid_result"
FROM 
    case_02_boolean b
LEFT JOIN 
    case_01_integers i ON b.status = i.col_tiny
LEFT JOIN 
    case_03_floats f ON b.is_active = CAST(f.col_float AS BIGINT);

DROP VIEW IF EXISTS view_case03_floats CASCADE; CREATE OR REPLACE VIEW view_case03_floats AS SELECT 
    f.col_float AS "rank",
    f.col_float_p AS "system",
    f.col_float_ps AS "groups",
    f.col_double AS "window",
    f.col_double_ps AS "function",
    f.col_decimal AS "role",
    f.col_numeric AS "admin",
    f.col_real AS "user",
    i.col_tiny AS "int_value",
    i.col_small AS "small_value",
    i.col_medium AS "medium_value",
    b.is_active AS "active_status",
    b.is_deleted AS "deleted_status",
    CASE 
        WHEN f.col_float > 0 THEN 'positive'
        WHEN f.col_float < 0 THEN 'negative'
        ELSE 'zero'
    END AS "case_result",
    COALESCE(f.col_float, 0) AS "ifnull_result",
    COALESCE(f.col_double, f.col_real, 0) AS "coalesce_result",
    CONCAT('Float: ', f.col_float) AS "concat_result",
    LENGTH(CAST(f.col_float AS TEXT)) AS "length_result",
    SUBSTRING(CAST(f.col_float AS TEXT), 1, 5) AS "substring_result",
    ROUND(CAST(f.col_float AS NUMERIC), 2) AS "round_result",
    CEIL(CAST(f.col_float AS NUMERIC)) AS "ceil_result",
    FLOOR(CAST(f.col_float AS NUMERIC)) AS "floor_result",
    ABS(CAST(f.col_float AS NUMERIC)) AS "abs_result",
    MOD(CAST(f.col_float AS NUMERIC), CAST(10 AS NUMERIC)) AS "mod_result",
    POWER(CAST(f.col_float AS NUMERIC), CAST(2 AS NUMERIC)) AS "power_result",
    SQRT(CAST(f.col_float AS NUMERIC)) AS "sqrt_result",
    SIN(CAST(f.col_float AS NUMERIC)) AS "sin_result",
    COS(CAST(f.col_float AS NUMERIC)) AS "cos_result",
    TAN(CAST(f.col_float AS NUMERIC)) AS "tan_result",
    LN(f.col_float) AS "log_result",
    EXP(CAST(f.col_float AS NUMERIC)) AS "exp_result",
    GREATEST(CAST(f.col_float AS NUMERIC), CAST(f.col_double AS NUMERIC), CAST(f.col_real AS NUMERIC)) AS "greatest_result",
    LEAST(CAST(f.col_float AS NUMERIC), CAST(f.col_double AS NUMERIC), CAST(f.col_real AS NUMERIC)) AS "least_result",
    STRPOS(CAST(f.col_float AS TEXT), CAST('.' AS TEXT)) AS "instr_result",
    REPLACE(CAST(f.col_float AS TEXT), CAST('.' AS TEXT), CAST(',' AS TEXT)) AS "replace_result",
    TRIM(CAST(f.col_float AS TEXT)) AS "trim_result",
    UPPER(CAST(f.col_float AS TEXT)) AS "upper_result",
    LOWER(CAST(f.col_float AS TEXT)) AS "lower_result",
    REVERSE(CAST(f.col_float AS TEXT)) AS "reverse_result",
    LEFT(CAST(f.col_float AS TEXT), 5) AS "left_result",
    RIGHT(CAST(f.col_float AS TEXT), 5) AS "right_result",
    SUBSTRING(CAST(f.col_float AS TEXT), 2, 3) AS "mid_result"
FROM 
    case_03_floats f
LEFT JOIN 
    case_01_integers i ON CAST(f.col_float AS BIGINT) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON CAST(f.col_float AS BIGINT) = b.status;

DROP VIEW IF EXISTS view_case04_mb3_suffix CASCADE; CREATE OR REPLACE VIEW view_case04_mb3_suffix AS SELECT 
    m.col_var_mb3 AS "rank",
    m.col_char_mb3 AS "system",
    m.col_text_mb3 AS "groups",
    m.col_mixed_mb3 AS "window",
    i.col_tiny AS "function",
    i.col_small AS "role",
    i.col_medium AS "admin",
    i.col_int AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    f.col_double AS "double_value",
    CASE 
        WHEN LENGTH(CAST(m.col_var_mb3 AS TEXT)) > 10 THEN 'long'
        ELSE 'short'
    END AS "case_result",
    COALESCE(m.col_var_mb3, 'default') AS "ifnull_result",
    COALESCE(m.col_char_mb3, m.col_mixed_mb3, 'default') AS "coalesce_result",
    CONCAT('Var: ', m.col_var_mb3) AS "concat_result",
    LENGTH(CAST(m.col_var_mb3 AS TEXT)) AS "length_result",
    SUBSTRING(CAST(m.col_var_mb3 AS TEXT), 1, 10) AS "substring_result",
    UPPER(CAST(m.col_var_mb3 AS TEXT)) AS "upper_result",
    LOWER(CAST(m.col_var_mb3 AS TEXT)) AS "lower_result",
    TRIM(CAST(m.col_var_mb3 AS TEXT)) AS "trim_result",
    REVERSE(CAST(m.col_var_mb3 AS TEXT)) AS "reverse_result",
    LEFT(CAST(m.col_var_mb3 AS TEXT), 5) AS "left_result",
    RIGHT(CAST(m.col_var_mb3 AS TEXT), 5) AS "right_result",
    SUBSTRING(CAST(m.col_var_mb3 AS TEXT), 2, 5) AS "mid_result",
    STRPOS(CAST(m.col_var_mb3 AS TEXT), CAST('a' AS TEXT)) AS "instr_result",
    REPLACE(CAST(m.col_var_mb3 AS TEXT), CAST('a' AS TEXT), CAST('b' AS TEXT)) AS "replace_result",
    CONCAT_WS('-', m.col_var_mb3, m.col_char_mb3) AS "concat_ws_result",
    (CASE WHEN (1) >= 0 THEN array_to_string((string_to_array(CAST(m.col_var_mb3 AS TEXT), ' '))[1:(1)], ' ') ELSE array_to_string((string_to_array(CAST(m.col_var_mb3 AS TEXT), ' '))[GREATEST(1, COALESCE(array_length(string_to_array(CAST(m.col_var_mb3 AS TEXT), ' '), 1), 0) + (1) + 1):], ' ') END) AS "substring_index_result",
    LENGTH(CAST(m.col_var_mb3 AS TEXT)) AS "char_length_result",
    LPAD(CAST(m.col_var_mb3 AS TEXT), 20, CAST('0' AS TEXT)) AS "lpad_result",
    RPAD(CAST(m.col_var_mb3 AS TEXT), 20, CAST('0' AS TEXT)) AS "rpad_result",
    REPEAT(CAST(m.col_var_mb3 AS TEXT), 2) AS "repeat_result",
    REPEAT(' ', 5) AS "space_result",
    CASE WHEN CAST(m.col_var_mb3 AS TEXT) < CAST(m.col_char_mb3 AS TEXT) THEN -1 WHEN CAST(m.col_var_mb3 AS TEXT) > CAST(m.col_char_mb3 AS TEXT) THEN 1 ELSE 0 END AS "strcmp_result",
    LOWER(CAST(m.col_var_mb3 AS TEXT)) AS "lcase_result",
    UPPER(CAST(m.col_var_mb3 AS TEXT)) AS "ucase_result",
    ASCII(CAST(m.col_var_mb3 AS TEXT)) AS "ascii_result",
    BIN(ASCII(CAST(m.col_var_mb3 AS TEXT))) AS "bin_result",
    HEX(ASCII(CAST(m.col_var_mb3 AS TEXT))) AS "hex_result"
FROM 
    case_04_mb3_suffix m
LEFT JOIN 
    case_01_integers i ON LENGTH(CAST(m.col_var_mb3 AS TEXT)) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON LENGTH(CAST(m.col_var_mb3 AS TEXT)) = b.status
LEFT JOIN 
    case_03_floats f ON LENGTH(CAST(m.col_var_mb3 AS TEXT)) = CAST(f.col_float AS BIGINT);

DROP VIEW IF EXISTS view_case05_charsets CASCADE; CREATE OR REPLACE VIEW view_case05_charsets AS SELECT 
    c.c1 AS "rank",
    c.c2 AS "system",
    c.c3 AS "groups",
    c.c4 AS "window",
    c.c5 AS "function",
    c.c6 AS "role",
    i.col_tiny AS "admin",
    i.col_small AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    CASE 
        WHEN LENGTH(CAST(c.c1 AS TEXT)) > 5 THEN 'long'
        ELSE 'short'
    END AS "case_result",
    COALESCE(c.c1, 'default') AS "ifnull_result",
    COALESCE(c.c2, c.c3, c.c4, 'default') AS "coalesce_result",
    CONCAT('C1: ', c.c1) AS "concat_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "length_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 1, 5) AS "substring_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "upper_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lower_result",
    TRIM(CAST(c.c1 AS TEXT)) AS "trim_result",
    REVERSE(CAST(c.c1 AS TEXT)) AS "reverse_result",
    LEFT(CAST(c.c1 AS TEXT), 3) AS "left_result",
    RIGHT(CAST(c.c1 AS TEXT), 3) AS "right_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 2, 3) AS "mid_result",
    STRPOS(CAST(c.c1 AS TEXT), CAST('a' AS TEXT)) AS "instr_result",
    REPLACE(CAST(c.c1 AS TEXT), CAST('a' AS TEXT), CAST('b' AS TEXT)) AS "replace_result",
    CONCAT_WS('-', c.c1, c.c2, c.c3) AS "concat_ws_result",
    (CASE WHEN (1) >= 0 THEN array_to_string((string_to_array(CAST(c.c1 AS TEXT), ' '))[1:(1)], ' ') ELSE array_to_string((string_to_array(CAST(c.c1 AS TEXT), ' '))[GREATEST(1, COALESCE(array_length(string_to_array(CAST(c.c1 AS TEXT), ' '), 1), 0) + (1) + 1):], ' ') END) AS "substring_index_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "char_length_result",
    LPAD(CAST(c.c1 AS TEXT), 10, CAST('0' AS TEXT)) AS "lpad_result",
    RPAD(CAST(c.c1 AS TEXT), 10, CAST('0' AS TEXT)) AS "rpad_result",
    REPEAT(CAST(c.c1 AS TEXT), 2) AS "repeat_result",
    REPEAT(' ', 3) AS "space_result",
    CASE WHEN CAST(CAST(c.c1 AS TEXT) AS TEXT) < CAST(c.c2 AS TEXT) THEN -1 WHEN CAST(CAST(c.c1 AS TEXT) AS TEXT) > CAST(c.c2 AS TEXT) THEN 1 ELSE 0 END AS "strcmp_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lcase_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "ucase_result",
    ASCII(CAST(c.c1 AS TEXT)) AS "ascii_result",
    BIN(ASCII(CAST(c.c1 AS TEXT))) AS "bin_result",
    HEX(ASCII(CAST(c.c1 AS TEXT))) AS "hex_result"
FROM 
    case_05_charsets c
LEFT JOIN 
    case_01_integers i ON LENGTH(CAST(c.c1 AS TEXT)) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON LENGTH(CAST(c.c1 AS TEXT)) = b.status
LEFT JOIN 
    case_03_floats f ON LENGTH(CAST(c.c1 AS TEXT)) = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON c.c1 = m.col_var_mb3;

DROP VIEW IF EXISTS view_case06_collates CASCADE; CREATE OR REPLACE VIEW view_case06_collates AS SELECT 
    c.c1 AS "rank",
    c.c2 AS "system",
    c.c3 AS "groups",
    c.c4 AS "window",
    c.c5 AS "function",
    i.col_tiny AS "role",
    i.col_small AS "admin",
    i.col_medium AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    ch.c1 AS "charset_value",
    CASE 
        WHEN LENGTH(CAST(c.c1 AS TEXT)) > 8 THEN 'long'
        ELSE 'short'
    END AS "case_result",
    COALESCE(c.c1, 'default') AS "ifnull_result",
    COALESCE(c.c2, c.c3, c.c4, c.c5, 'default') AS "coalesce_result",
    CONCAT('Collate: ', c.c1) AS "concat_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "length_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 1, 8) AS "substring_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "upper_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lower_result",
    TRIM(CAST(c.c1 AS TEXT)) AS "trim_result",
    REVERSE(CAST(c.c1 AS TEXT)) AS "reverse_result",
    LEFT(CAST(c.c1 AS TEXT), 4) AS "left_result",
    RIGHT(CAST(c.c1 AS TEXT), 4) AS "right_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 2, 4) AS "mid_result",
    STRPOS(CAST(c.c1 AS TEXT), CAST('_' AS TEXT)) AS "instr_result",
    REPLACE(CAST(c.c1 AS TEXT), CAST('_' AS TEXT), CAST('-' AS TEXT)) AS "replace_result",
    CONCAT_WS('|', c.c1, c.c2, c.c3) AS "concat_ws_result",
    (CASE WHEN (1) >= 0 THEN array_to_string((string_to_array(CAST(c.c1 AS TEXT), '_'))[1:(1)], '_') ELSE array_to_string((string_to_array(CAST(c.c1 AS TEXT), '_'))[GREATEST(1, COALESCE(array_length(string_to_array(CAST(c.c1 AS TEXT), '_'), 1), 0) + (1) + 1):], '_') END) AS "substring_index_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "char_length_result",
    LPAD(CAST(c.c1 AS TEXT), 15, CAST(' ' AS TEXT)) AS "lpad_result",
    RPAD(CAST(c.c1 AS TEXT), 15, CAST(' ' AS TEXT)) AS "rpad_result",
    REPEAT(CAST(c.c1 AS TEXT), 2) AS "repeat_result",
    REPEAT(' ', 4) AS "space_result",
    CASE WHEN CAST(c.c1 AS TEXT) < CAST(c.c2 AS TEXT) THEN -1 WHEN CAST(c.c1 AS TEXT) > CAST(c.c2 AS TEXT) THEN 1 ELSE 0 END AS "strcmp_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lcase_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "ucase_result",
    ASCII(CAST(c.c1 AS TEXT)) AS "ascii_result",
    BIN(ASCII(CAST(c.c1 AS TEXT))) AS "bin_result",
    HEX(ASCII(CAST(c.c1 AS TEXT))) AS "hex_result"
FROM 
    case_06_collates c
LEFT JOIN 
    case_01_integers i ON LENGTH(CAST(c.c1 AS TEXT)) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON LENGTH(CAST(c.c1 AS TEXT)) = b.status
LEFT JOIN 
    case_03_floats f ON LENGTH(CAST(c.c1 AS TEXT)) = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON c.c1 = m.col_var_mb3
LEFT JOIN 
    case_05_charsets ch ON c.c1 = ch.c1;

DROP VIEW IF EXISTS view_case07_complex_charsets CASCADE; CREATE OR REPLACE VIEW view_case07_complex_charsets AS SELECT 
    c.c1 AS "rank",
    c.c2 AS "system",
    c.c3 AS "groups",
    i.col_tiny AS "window",
    i.col_small AS "function",
    i.col_medium AS "role",
    i.col_int AS "admin",
    i.col_integer AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    ch.c1 AS "charset_value",
    co.c1 AS "collate_value",
    CASE 
        WHEN LENGTH(CAST(c.c1 AS TEXT)) > 5 THEN 'long'
        ELSE 'short'
    END AS "case_result",
    COALESCE(c.c1, 'default') AS "ifnull_result",
    COALESCE(c.c2, c.c3, 'default') AS "coalesce_result",
    CONCAT('Complex: ', c.c1) AS "concat_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "length_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 1, 5) AS "substring_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "upper_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lower_result",
    TRIM(CAST(c.c1 AS TEXT)) AS "trim_result",
    REVERSE(CAST(c.c1 AS TEXT)) AS "reverse_result",
    LEFT(CAST(c.c1 AS TEXT), 3) AS "left_result",
    RIGHT(CAST(c.c1 AS TEXT), 3) AS "right_result",
    SUBSTRING(CAST(c.c1 AS TEXT), 2, 3) AS "mid_result",
    STRPOS(CAST(c.c1 AS TEXT), CAST('a' AS TEXT)) AS "instr_result",
    REPLACE(CAST(c.c1 AS TEXT), CAST('a' AS TEXT), CAST('z' AS TEXT)) AS "replace_result",
    CONCAT_WS('-', c.c1, c.c2, c.c3) AS "concat_ws_result",
    (CASE WHEN (1) >= 0 THEN array_to_string((string_to_array(CAST(c.c1 AS TEXT), ' '))[1:(1)], ' ') ELSE array_to_string((string_to_array(CAST(c.c1 AS TEXT), ' '))[GREATEST(1, COALESCE(array_length(string_to_array(CAST(c.c1 AS TEXT), ' '), 1), 0) + (1) + 1):], ' ') END) AS "substring_index_result",
    LENGTH(CAST(c.c1 AS TEXT)) AS "char_length_result",
    LPAD(CAST(c.c1 AS TEXT), 10, CAST('x' AS TEXT)) AS "lpad_result",
    RPAD(CAST(c.c1 AS TEXT), 10, CAST('x' AS TEXT)) AS "rpad_result",
    REPEAT(CAST(c.c1 AS TEXT), 2) AS "repeat_result",
    REPEAT(' ', 3) AS "space_result",
    CASE WHEN CAST(c.c1 AS TEXT) < CAST(c.c2 AS TEXT) THEN -1 WHEN CAST(c.c1 AS TEXT) > CAST(c.c2 AS TEXT) THEN 1 ELSE 0 END AS "strcmp_result",
    LOWER(CAST(c.c1 AS TEXT)) AS "lcase_result",
    UPPER(CAST(c.c1 AS TEXT)) AS "ucase_result",
    ASCII(CAST(c.c1 AS TEXT)) AS "ascii_result",
    BIN(ASCII(CAST(c.c1 AS TEXT))) AS "bin_result",
    HEX(ASCII(CAST(c.c1 AS TEXT))) AS "hex_result"
FROM 
    case_07_complex_charsets c
LEFT JOIN 
    case_01_integers i ON LENGTH(CAST(c.c1 AS TEXT)) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON LENGTH(CAST(c.c1 AS TEXT)) = b.status
LEFT JOIN 
    case_03_floats f ON LENGTH(CAST(c.c1 AS TEXT)) = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON c.c1 = m.col_var_mb3
LEFT JOIN 
    case_05_charsets ch ON c.c1 = ch.c1
LEFT JOIN 
    case_06_collates co ON c.c1 = co.c1;

DROP VIEW IF EXISTS view_case08_json CASCADE; CREATE OR REPLACE VIEW view_case08_json AS SELECT 
    j.data AS "rank",
    j.data_len AS "system",
    j.data_upper AS "groups",
    i.col_tiny AS "window",
    i.col_small AS "function",
    i.col_medium AS "role",
    i.col_int AS "admin",
    i.col_integer AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    ch.c1 AS "charset_value",
    co.c1 AS "collate_value",
    cm.c1 AS "complex_value",
    CASE 
        WHEN (CASE WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'array' THEN jsonb_array_length(CAST(j.data AS jsonb)) WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'object' THEN (SELECT count(*) FROM jsonb_object_keys(CAST(j.data AS jsonb))) ELSE 1 END) > 0 THEN 'has_data'
        ELSE 'empty'
    END AS "case_result",
    COALESCE(j.data, '{}') AS "ifnull_result",
    COALESCE(j.data_len, j.data_upper, j.data, '{}') AS "coalesce_result",
    CONCAT('JSON: ', jsonb_typeof(CAST(j.data AS jsonb))) AS "concat_result",
    LENGTH(CAST(j.data AS TEXT)) AS "length_result",
    SUBSTRING(CAST(j.data AS TEXT), 1, 20) AS "substring_result",
    (CAST(j.data AS jsonb) #> '{id}') AS "json_extract_result",
    (CAST(j.data AS jsonb) #>> '{name}') AS "json_unquote_result",
    (SELECT jsonb_agg(k) FROM jsonb_object_keys(CAST(j.data AS jsonb)) AS k) AS "json_keys_result",
    (CASE WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'array' THEN jsonb_array_length(CAST(j.data AS jsonb)) WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'object' THEN (SELECT count(*) FROM jsonb_object_keys(CAST(j.data AS jsonb))) ELSE 1 END) AS "json_length_result",
    jsonb_typeof(CAST(j.data AS jsonb)) AS "json_type_result",
    JSON_VALID(j.data) AS "json_valid_result",
    JSON_CONTAINS_PATH(j.data, 'one', '$.id') AS "json_contains_path_result",
    JSON_DEPTH(j.data) AS "json_depth_result",
    JSON_OVERLAPS(j.data, j.data_len) AS "json_overlaps_result",
    JSON_PRETTY(j.data) AS "json_pretty_result",
    TRIM(CAST(j.data AS TEXT)) AS "trim_result",
    UPPER(CAST(j.data AS TEXT)) AS "upper_result",
    LOWER(CAST(j.data AS TEXT)) AS "lower_result",
    REVERSE(CAST(j.data AS TEXT)) AS "reverse_result",
    LEFT(CAST(j.data AS TEXT), 10) AS "left_result",
    RIGHT(CAST(j.data AS TEXT), 10) AS "right_result",
    SUBSTRING(CAST(j.data AS TEXT), 2, 10) AS "mid_result",
    STRPOS(CAST(j.data AS TEXT), CAST('id' AS TEXT)) AS "instr_result",
    REPLACE(CAST(j.data AS TEXT), CAST('id' AS TEXT), CAST('identifier' AS TEXT)) AS "replace_result"
FROM 
    case_08_json j
LEFT JOIN 
    case_01_integers i ON (CASE WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'array' THEN jsonb_array_length(CAST(j.data AS jsonb)) WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'object' THEN (SELECT count(*) FROM jsonb_object_keys(CAST(j.data AS jsonb))) ELSE 1 END) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON (CASE WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'array' THEN jsonb_array_length(CAST(j.data AS jsonb)) WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'object' THEN (SELECT count(*) FROM jsonb_object_keys(CAST(j.data AS jsonb))) ELSE 1 END) = b.status
LEFT JOIN 
    case_03_floats f ON (CASE WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'array' THEN jsonb_array_length(CAST(j.data AS jsonb)) WHEN jsonb_typeof(CAST(j.data AS jsonb)) = 'object' THEN (SELECT count(*) FROM jsonb_object_keys(CAST(j.data AS jsonb))) ELSE 1 END) = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON (CAST(j.data AS jsonb) #>> '{name}') = m.col_var_mb3
LEFT JOIN 
    case_05_charsets ch ON (CAST(j.data AS jsonb) #>> '{name}') = ch.c1
LEFT JOIN 
    case_06_collates co ON (CAST(j.data AS jsonb) #>> '{name}') = co.c1
LEFT JOIN 
    case_07_complex_charsets cm ON (CAST(j.data AS jsonb) #>> '{name}') = cm.c1;

DROP VIEW IF EXISTS view_case09_datetime CASCADE; CREATE OR REPLACE VIEW view_case09_datetime AS SELECT 
    d.d1 AS "rank",
    d.t1 AS "system",
    d.t2 AS "groups",
    d.dt1 AS "window",
    d.dt2 AS "function",
    d.ts1 AS "role",
    d.ts2 AS "admin",
    d.y1 AS "user",
    i.col_tiny AS "int_value",
    i.col_small AS "small_value",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    ch.c1 AS "charset_value",
    co.c1 AS "collate_value",
    cm.c1 AS "complex_value",
    j.data AS "json_value",
    CASE 
        WHEN d.d1 > CURRENT_DATE THEN 'future'
        WHEN d.d1 < CURRENT_DATE THEN 'past'
        ELSE 'today'
    END AS "case_result",
    COALESCE(d.d1, CURRENT_DATE) AS "ifnull_result",
    COALESCE(d.dt1, d.ts1, CURRENT_TIMESTAMP) AS "coalesce_result",
    CONCAT('Date: ', d.d1) AS "concat_result",
    CAST(EXTRACT(YEAR FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "year_result",
    CAST(EXTRACT(MONTH FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "month_result",
    CAST(EXTRACT(DAY FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "day_result",
    CAST(EXTRACT(HOUR FROM CAST(d.t1 AS TIMESTAMP)) AS BIGINT) AS "hour_result",
    CAST(EXTRACT(MINUTE FROM CAST(d.t1 AS TIMESTAMP)) AS BIGINT) AS "minute_result",
    CAST(EXTRACT(SECOND FROM CAST(d.t1 AS TIMESTAMP)) AS BIGINT) AS "second_result",
    to_char(CAST(d.dt1 AS TIMESTAMP), 'YYYY-MM-DD') AS "date_format_result",
    (CAST(d.d1 AS TIMESTAMP) + INTERVAL '1 DAY') AS "date_add_result",
    (CAST(d.d1 AS TIMESTAMP) - INTERVAL '1 DAY') AS "date_sub_result",
    (CAST(d.d1 AS DATE) - CAST(CURRENT_DATE AS DATE)) AS "datediff_result",
    to_char(CAST(d.t1 AS TIMESTAMP) - CAST(d.t2 AS TIMESTAMP), 'HH24:MI:SS') AS "timediff_result",
    CURRENT_TIMESTAMP AS "now_result",
    CURRENT_DATE AS "curdate_result",
    to_char(CURRENT_TIMESTAMP, 'HH24:MI:SS') AS "curtime_result",
    CAST(EXTRACT(EPOCH FROM CAST(d.dt1 AS TIMESTAMP)) AS BIGINT) AS "unix_timestamp_result",
    TO_TIMESTAMP(CAST(EXTRACT(EPOCH FROM CAST(d.dt1 AS TIMESTAMP)) AS BIGINT)) AS "from_unixtime_result",
    CAST(d.dt1 AS DATE) AS "date_result",
    CAST(d.dt1 AS TIME) AS "time_result",
    CAST(DATE_TRUNC('month', CAST(d.d1 AS TIMESTAMP)) + INTERVAL '1 month' - INTERVAL '1 day' AS DATE) AS "last_day_result",
    (CAST(EXTRACT(DOW FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) + 1) AS "dayofweek_result",
    CAST(EXTRACT(DAY FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "dayofmonth_result",
    CAST(EXTRACT(DOY FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "dayofyear_result",
    CAST(EXTRACT(WEEK FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "week_result",
    CAST(EXTRACT(QUARTER FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) AS "quarter_result"
FROM 
    case_09_datetime d
LEFT JOIN 
    case_01_integers i ON CAST(EXTRACT(YEAR FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON CAST(EXTRACT(MONTH FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) = b.status
LEFT JOIN 
    case_03_floats f ON CAST(EXTRACT(DAY FROM CAST(d.d1 AS TIMESTAMP)) AS BIGINT) = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON to_char(CAST(d.d1 AS TIMESTAMP), 'YYYY-MM-DD') = m.col_var_mb3
LEFT JOIN 
    case_05_charsets ch ON to_char(CAST(d.d1 AS TIMESTAMP), 'YYYY-MM-DD') = ch.c1
LEFT JOIN 
    case_06_collates co ON to_char(CAST(d.d1 AS TIMESTAMP), 'YYYY-MM-DD') = co.c1
LEFT JOIN 
    case_07_complex_charsets cm ON to_char(CAST(d.d1 AS TIMESTAMP), 'YYYY-MM-DD') = cm.c1
LEFT JOIN 
    case_08_json j ON to_char(CAST(d.d1 AS TIMESTAMP), 'YYYY-MM-DD') = (CAST(j.data AS jsonb) #>> '{date}');

DROP VIEW IF EXISTS view_case10_defaults CASCADE; CREATE OR REPLACE VIEW view_case10_defaults AS SELECT 
    d.c1 AS "rank",
    d.c2 AS "system",
    d.c3 AS "groups",
    d.c4 AS "window",
    d.c5 AS "function",
    d.c6 AS "role",
    i.col_tiny AS "admin",
    i.col_small AS "user",
    b.is_active AS "status",
    b.is_deleted AS "type",
    f.col_float AS "float_value",
    m.col_var_mb3 AS "text_value",
    ch.c1 AS "charset_value",
    co.c1 AS "collate_value",
    cm.c1 AS "complex_value",
    j.data AS "json_value",
    dt.d1 AS "date_value",
    CASE 
        WHEN d.c1 > 0 THEN 'positive'
        WHEN d.c1 < 0 THEN 'negative'
        ELSE 'zero'
    END AS "case_result",
    COALESCE(d.c1, 0) AS "ifnull_result",
    COALESCE(d.c2, d.c3, d.c4, 0) AS "coalesce_result",
    CONCAT('Default: ', d.c3) AS "concat_result",
    LENGTH(CAST(d.c3 AS TEXT)) AS "length_result",
    SUBSTRING(CAST(d.c3 AS TEXT), 1, 5) AS "substring_result",
    UPPER(CAST(d.c3 AS TEXT)) AS "upper_result",
    LOWER(CAST(d.c3 AS TEXT)) AS "lower_result",
    TRIM(CAST(d.c3 AS TEXT)) AS "trim_result",
    REVERSE(CAST(d.c3 AS TEXT)) AS "reverse_result",
    LEFT(CAST(d.c3 AS TEXT), 3) AS "left_result",
    RIGHT(CAST(d.c3 AS TEXT), 3) AS "right_result",
    SUBSTRING(CAST(d.c3 AS TEXT), 2, 3) AS "mid_result",
    STRPOS(CAST(d.c3 AS TEXT), CAST('a' AS TEXT)) AS "instr_result",
    REPLACE(CAST(d.c3 AS TEXT), CAST('a' AS TEXT), CAST('b' AS TEXT)) AS "replace_result",
    to_char(CAST(d.c4 AS TIMESTAMP), 'YYYY-MM-DD HH24:MI:SS') AS "date_format_result",
    CAST(TRUNC(EXTRACT(EPOCH FROM (CAST(CURRENT_TIMESTAMP AS TIMESTAMP) - CAST(d.c4 AS TIMESTAMP))) / 1) AS BIGINT) AS "timestampdiff_result",
    TO_TIMESTAMP(CAST(EXTRACT(EPOCH FROM CAST(d.c4 AS TIMESTAMP)) AS BIGINT)) AS "from_unixtime_result",
    CAST(EXTRACT(EPOCH FROM CAST(d.c4 AS TIMESTAMP)) AS BIGINT) AS "unix_timestamp_result",
    CURRENT_TIMESTAMP AS "now_result",
    CURRENT_DATE AS "curdate_result",
    to_char(CURRENT_TIMESTAMP, 'HH24:MI:SS') AS "curtime_result",
    (CAST(CURRENT_TIMESTAMP AS DATE) - CAST(d.c4 AS DATE)) AS "datediff_result",
    CAST(EXTRACT(EPOCH FROM CAST(d.c4 AS TIME)) AS BIGINT) AS "time_to_sec_result",
    to_char(CAST(CAST(EXTRACT(EPOCH FROM CAST(d.c4 AS TIME)) AS BIGINT) AS BIGINT) * INTERVAL '1 second', 'HH24:MI:SS') AS "sec_to_time_result"
FROM 
    case_10_defaults d
LEFT JOIN 
    case_01_integers i ON d.c1 = i.col_tiny
LEFT JOIN 
    case_02_boolean b ON d.c1 = b.status
LEFT JOIN 
    case_03_floats f ON d.c1 = CAST(f.col_float AS BIGINT)
LEFT JOIN 
    case_04_mb3_suffix m ON CAST(d.c3 AS TEXT) = m.col_var_mb3
LEFT JOIN 
    case_05_charsets ch ON CAST(d.c3 AS TEXT) = ch.c1
LEFT JOIN 
    case_06_collates co ON d.c3  = co.c1
LEFT JOIN 
    case_07_complex_charsets cm ON CAST(d.c3 AS TEXT) = cm.c1
LEFT JOIN 
    case_08_json j ON d.c3 = (CAST(j.data AS jsonb) #>> '{name}')
LEFT JOIN 
    case_09_datetime dt ON d.c4 = dt.dt1;

-- ==== stage: indexes ====

CREATE INDEX IF NOT EXISTS case_01_integers_idx_case01_col_int ON case_01_integers (col_int);

CREATE UNIQUE INDEX IF NOT EXISTS case_01_integers_uidx_case01_col_big ON case_01_integers (col_big);

CREATE INDEX IF NOT EXISTS case_01_integers_idx_case01_composite ON case_01_integers (col_small, col_medium);

CREATE INDEX IF NOT EXISTS case_01_integers_idx_case01_col_int_prec ON case_01_integers (col_int_prec);

CREATE INDEX IF NOT EXISTS case_02_boolean_idx_case02_is_active ON case_02_boolean (is_active);

CREATE INDEX IF NOT EXISTS case_02_boolean_idx_case02_status ON case_02_boolean (status);

CREATE INDEX IF NOT EXISTS case_02_boolean_idx_case02_is_deleted ON case_02_boolean (is_deleted);

CREATE INDEX IF NOT EXISTS case_02_boolean_idx_case02_composite ON case_02_boolean (is_active, status);

CREATE INDEX IF NOT EXISTS case_03_floats_idx_case03_col_decimal ON case_03_floats (col_decimal);

CREATE INDEX IF NOT EXISTS case_03_floats_idx_case03_col_float ON case_03_floats (col_float);

CREATE INDEX IF NOT EXISTS case_03_floats_idx_case03_composite ON case_03_floats (col_double, col_real);

CREATE INDEX IF NOT EXISTS case_04_mb3_suffix_idx_case04_col_var_mb3 ON case_04_mb3_suffix (col_var_mb3);

CREATE INDEX IF NOT EXISTS case_04_mb3_suffix_idx_case04_col_char_mb3 ON case_04_mb3_suffix (col_char_mb3);

CREATE INDEX IF NOT EXISTS case_04_mb3_suffix_idx_case04_composite ON case_04_mb3_suffix (col_var_mb3, col_char_mb3);

CREATE INDEX IF NOT EXISTS case_04_mb3_suffix_idx_case04_col_var_mb3_prefix ON case_04_mb3_suffix (col_var_mb3);

CREATE INDEX IF NOT EXISTS case_05_charsets_idx_case05_c1 ON case_05_charsets (c1);

CREATE INDEX IF NOT EXISTS case_05_charsets_idx_case05_c2 ON case_05_charsets (c2);

CREATE INDEX IF NOT EXISTS case_05_charsets_idx_case05_c3 ON case_05_charsets (c3);

CREATE INDEX IF NOT EXISTS case_05_charsets_idx_case05_composite ON case_05_charsets (c4, c5);

CREATE INDEX IF NOT EXISTS case_06_collates_idx_case06_c1 ON case_06_collates (c1);

CREATE INDEX IF NOT EXISTS case_06_collates_idx_case06_c2 ON case_06_collates (c2);

CREATE INDEX IF NOT EXISTS case_06_collates_idx_case06_c3 ON case_06_collates (c3);

CREATE INDEX IF NOT EXISTS case_06_collates_idx_case06_composite ON case_06_collates (c4, c5);

CREATE INDEX IF NOT EXISTS case_07_complex_charsets_idx_case07_c1 ON case_07_complex_charsets (c1);

CREATE INDEX IF NOT EXISTS case_07_complex_charsets_idx_case07_c2 ON case_07_complex_charsets (c2);

CREATE INDEX IF NOT EXISTS case_07_complex_charsets_idx_case07_c3 ON case_07_complex_charsets (c3);

CREATE INDEX IF NOT EXISTS case_07_complex_charsets_idx_case07_composite ON case_07_complex_charsets (c1, c2);

CREATE INDEX IF NOT EXISTS case_09_datetime_idx_case09_d1 ON case_09_datetime (d1);

CREATE INDEX IF NOT EXISTS case_09_datetime_idx_case09_dt1 ON case_09_datetime (dt1);

CREATE INDEX IF NOT EXISTS case_09_datetime_idx_case09_ts1 ON case_09_datetime (ts1);

CREATE INDEX IF NOT EXISTS case_09_datetime_idx_case09_composite ON case_09_datetime (d1, t1);

CREATE INDEX IF NOT EXISTS case_09_datetime_idx_case09_dt1_desc ON case_09_datetime (dt1);

CREATE INDEX IF NOT EXISTS case_10_defaults_idx_case10_c1 ON case_10_defaults (c1);

CREATE INDEX IF NOT EXISTS case_10_defaults_idx_case10_c3 ON case_10_defaults (c3);

CREATE INDEX IF NOT EXISTS case_10_defaults_idx_case10_c4 ON case_10_defaults (c4);

CREATE INDEX IF NOT EXISTS case_10_defaults_idx_case10_composite ON case_10_defaults (c1, c2);

CREATE INDEX IF NOT EXISTS case_11_autoincrement_idx_case11_big_id ON case_11_autoincrement (big_id);

CREATE INDEX IF NOT EXISTS case_11_autoincrement_idx_case11_mixed_case ON case_11_autoincrement (mixed_case);

CREATE INDEX IF NOT EXISTS case_12_unsigned_idx_case12_c1 ON case_12_unsigned (c1);

CREATE INDEX IF NOT EXISTS case_12_unsigned_idx_case12_c2 ON case_12_unsigned (c2);

CREATE INDEX IF NOT EXISTS case_12_unsigned_idx_case12_c3 ON case_12_unsigned (c3);

CREATE INDEX IF NOT EXISTS case_12_unsigned_idx_case12_composite ON case_12_unsigned (c1, c2);

CREATE INDEX IF NOT EXISTS case_13_enum_set_idx_case13_e1 ON case_13_enum_set (e1);

CREATE INDEX IF NOT EXISTS case_13_enum_set_idx_case13_s1 ON case_13_enum_set (s1);

CREATE INDEX IF NOT EXISTS case_13_enum_set_idx_case13_composite ON case_13_enum_set (e1, s1);

CREATE INDEX IF NOT EXISTS case_14_binary_idx_case14_b1 ON case_14_binary (b1);

CREATE INDEX IF NOT EXISTS case_14_binary_idx_case14_b2 ON case_14_binary (b2);

CREATE INDEX IF NOT EXISTS case_14_binary_idx_case14_composite ON case_14_binary (b1, b2);

CREATE INDEX IF NOT EXISTS case_15_options_idx_case15_id ON case_15_options (id);

CREATE INDEX IF NOT EXISTS case_16_partition_idx_case16_id ON case_16_partition (id);

CREATE INDEX IF NOT EXISTS case_16_partition_idx_case16_created_at ON case_16_partition (created_at);

CREATE INDEX IF NOT EXISTS case_16_partition_idx_case16_composite ON case_16_partition (id, created_at);

CREATE INDEX IF NOT EXISTS case_18_quotes_idx_case18_id ON case_18_quotes (id);

CREATE INDEX IF NOT EXISTS case_18_quotes_idx_case18_name ON case_18_quotes (name);

CREATE INDEX IF NOT EXISTS case_18_quotes_idx_case18_desc ON case_18_quotes ("desc");

CREATE INDEX IF NOT EXISTS case_18_quotes_idx_case18_composite ON case_18_quotes (id, name);

CREATE INDEX IF NOT EXISTS case_19_comments_idx_case19_c1 ON case_19_comments (c1);

CREATE INDEX IF NOT EXISTS case_19_comments_idx_case19_c2 ON case_19_comments (c2);

CREATE INDEX IF NOT EXISTS case_19_comments_idx_case19_c3 ON case_19_comments (c3);

CREATE INDEX IF NOT EXISTS case_19_comments_idx_case19_composite ON case_19_comments (c1, c2);

CREATE INDEX IF NOT EXISTS case_20_constraints_idx_name ON case_20_constraints (name);

CREATE UNIQUE INDEX IF NOT EXISTS case_20_constraints_uk_name ON case_20_constraints (name);

CREATE INDEX IF NOT EXISTS case_20_constraints_idx_case20_name ON case_20_constraints (name);

CREATE INDEX IF NOT EXISTS case_21_virtual_idx_case21_id ON case_21_virtual (id);

CREATE INDEX IF NOT EXISTS case_21_virtual_idx_case21_c1 ON case_21_virtual (c1);

CREATE INDEX IF NOT EXISTS case_21_virtual_idx_case21_c2 ON case_21_virtual (c2);

CREATE INDEX IF NOT EXISTS case_21_virtual_idx_case21_composite ON case_21_virtual (id, c1);

CREATE INDEX IF NOT EXISTS case_23_weird_syntax_idx_case23_c1 ON case_23_weird_syntax (c1);

CREATE INDEX IF NOT EXISTS case_23_weird_syntax_idx_case23_c3 ON case_23_weird_syntax (c3);

CREATE INDEX IF NOT EXISTS case_23_weird_syntax_idx_case23_composite ON case_23_weird_syntax (c1, c2);

CREATE INDEX IF NOT EXISTS case_24_edge_cases_idx_case24_c1 ON case_24_edge_cases (c1);

CREATE INDEX IF NOT EXISTS case_24_edge_cases_idx_case24_c3 ON case_24_edge_cases (c3);

CREATE INDEX IF NOT EXISTS case_24_edge_cases_idx_case24_composite ON case_24_edge_cases (c3, c4);

CREATE INDEX IF NOT EXISTS case_25_mysql8_reserved_idx_case25_rank ON case_25_mysql8_reserved ("rank");

CREATE INDEX IF NOT EXISTS case_25_mysql8_reserved_idx_case25_system ON case_25_mysql8_reserved ("system");

CREATE INDEX IF NOT EXISTS case_25_mysql8_reserved_idx_case25_groups ON case_25_mysql8_reserved ("groups");

CREATE INDEX IF NOT EXISTS case_25_mysql8_reserved_idx_case25_composite ON case_25_mysql8_reserved ("rank", "system");

CREATE INDEX IF NOT EXISTS case_26_mysql8_invisible_idx_c1 ON case_26_mysql8_invisible (c1);

CREATE INDEX IF NOT EXISTS case_26_mysql8_invisible_idx_c2 ON case_26_mysql8_invisible (c2);

CREATE INDEX IF NOT EXISTS case_26_mysql8_invisible_idx_case26_id ON case_26_mysql8_invisible (id);

CREATE INDEX IF NOT EXISTS case_26_mysql8_invisible_idx_case26_c2_invisible ON case_26_mysql8_invisible (c2);

CREATE INDEX IF NOT EXISTS case_27_mysql8_check_idx_case27_id ON case_27_mysql8_check (id);

CREATE INDEX IF NOT EXISTS case_27_mysql8_check_idx_case27_age ON case_27_mysql8_check (age);

CREATE INDEX IF NOT EXISTS case_27_mysql8_check_idx_case27_composite ON case_27_mysql8_check (id, age);

CREATE INDEX IF NOT EXISTS case_28_mysql8_func_index_idx_name_upper ON case_28_mysql8_func_index ((UPPER(name)));

-- SKIP [case_28_mysql8_func_index]: functional index idx_data_val ((CAST(data->>'$.id' AS UNSIGNED ARRAY))): expression key outside the 

CREATE INDEX IF NOT EXISTS case_28_mysql8_func_index_idx_case28_name ON case_28_mysql8_func_index (name);

CREATE INDEX IF NOT EXISTS case_29_mysql8_defaults_idx_case29_id ON case_29_mysql8_defaults (id);

CREATE INDEX IF NOT EXISTS case_29_mysql8_defaults_idx_case29_val ON case_29_mysql8_defaults (val);

CREATE INDEX IF NOT EXISTS case_29_mysql8_defaults_idx_case29_composite ON case_29_mysql8_defaults (id, val);

CREATE INDEX IF NOT EXISTS case_30_mysql8_collations_idx_case30_c1 ON case_30_mysql8_collations (c1);

CREATE INDEX IF NOT EXISTS case_30_mysql8_collations_idx_case30_c2 ON case_30_mysql8_collations (c2);

CREATE INDEX IF NOT EXISTS case_30_mysql8_collations_idx_case30_c3 ON case_30_mysql8_collations (c3);

CREATE INDEX IF NOT EXISTS case_30_mysql8_collations_idx_case30_composite ON case_30_mysql8_collations (c1, c2);

CREATE INDEX IF NOT EXISTS case_31_sys_utf8mb3_idx_case31_host ON case_31_sys_utf8mb3 ("Host");

CREATE INDEX IF NOT EXISTS case_31_sys_utf8mb3_idx_case31_db ON case_31_sys_utf8mb3 ("Db");

CREATE INDEX IF NOT EXISTS case_31_sys_utf8mb3_idx_case31_user ON case_31_sys_utf8mb3 ("User");

CREATE INDEX IF NOT EXISTS case_31_sys_utf8mb3_idx_case31_composite ON case_31_sys_utf8mb3 ("Host", "Db", "User");

CREATE INDEX IF NOT EXISTS case_32_complex_generated_idx_case32_cost_name ON case_32_complex_generated (cost_name);

CREATE INDEX IF NOT EXISTS case_32_complex_generated_idx_case32_default_value ON case_32_complex_generated (default_value);

CREATE INDEX IF NOT EXISTS case_33_desc_index_idx_ts ON case_33_desc_index ("Password_timestamp");

CREATE INDEX IF NOT EXISTS case_33_desc_index_idx_case33_host ON case_33_desc_index ("Host");

CREATE INDEX IF NOT EXISTS case_33_desc_index_idx_case33_user ON case_33_desc_index ("User");

CREATE INDEX IF NOT EXISTS case_34_table_options_idx_case34_id ON case_34_table_options (id);

CREATE INDEX IF NOT EXISTS case_35_enum_charset_idx_case35_col_enum ON case_35_enum_charset (col_enum);

CREATE INDEX IF NOT EXISTS case_35_enum_charset_idx_case35_col_set ON case_35_enum_charset (col_set);

CREATE INDEX IF NOT EXISTS case_35_enum_charset_idx_case35_composite ON case_35_enum_charset (col_enum, col_set);

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_id ON case_36_uppercase ("ID");

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_name ON case_36_uppercase ("NAME");

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_email ON case_36_uppercase ("EMAIL");

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_create_date ON case_36_uppercase ("CREATE_DATE");

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_composite ON case_36_uppercase ("ID", "NAME");

CREATE INDEX IF NOT EXISTS case_36_uppercase_idx_test1_name_upper ON case_36_uppercase ("NAME");

CREATE INDEX IF NOT EXISTS case_37_hump_idx_case37_productid ON case_37_hump ("ProductId");

CREATE INDEX IF NOT EXISTS case_37_hump_idx_case37_productname ON case_37_hump ("ProductName");

CREATE INDEX IF NOT EXISTS case_37_hump_idx_case37_price ON case_37_hump ("Price");

CREATE INDEX IF NOT EXISTS case_37_hump_idx_case37_stock ON case_37_hump ("Stock");

CREATE INDEX IF NOT EXISTS case_37_hump_idx_case37_category ON case_37_hump ("ProductId", "CATEGORY");

CREATE INDEX IF NOT EXISTS case_38_snake_idx_case38_productid ON case_38_snake (product_id);

CREATE INDEX IF NOT EXISTS case_38_snake_idx_case38_product_name ON case_38_snake (product_name);

CREATE INDEX IF NOT EXISTS case_38_snake_idx_case38_price ON case_38_snake (price);

CREATE INDEX IF NOT EXISTS case_38_snake_idx_case38_category ON case_38_snake (product_id, category);

CREATE INDEX IF NOT EXISTS case_39_underscore_idx_case39_productid ON case_39_underscore (product_id);

CREATE INDEX IF NOT EXISTS case_39_underscore_idx_case39_product_name ON case_39_underscore (product_name);

CREATE INDEX IF NOT EXISTS case_39_underscore_idx_case39_price ON case_39_underscore (price);

CREATE INDEX IF NOT EXISTS case_39_underscore_idx_case39_category ON case_39_underscore (product_id, category);

CREATE INDEX IF NOT EXISTS case_40_default_idx_case40_id ON case_40_default (id);

CREATE INDEX IF NOT EXISTS case_40_default_idx_case40_name ON case_40_default (name);

CREATE INDEX IF NOT EXISTS case_40_default_idx_case40_email ON case_40_default (email);

CREATE INDEX IF NOT EXISTS case_40_default_idx_case40_id_name ON case_40_default (id, name);

CREATE INDEX IF NOT EXISTS case_42_fulltext_ft_title_content ON case_42_fulltext USING GIN (to_tsvector('simple', coalesce(title::text, '') || ' ' || coalesce(content::text, '')));

CREATE INDEX IF NOT EXISTS case_48_index_types_idx_name_btree ON case_48_index_types (name);

CREATE INDEX IF NOT EXISTS case_48_index_types_idx_value_hash ON case_48_index_types (value);

-- ==== stage: fkeys ====

ALTER TABLE case_41_foreign_key ADD CONSTRAINT case_41_foreign_key_ibfk_parent_id FOREIGN KEY (parent_id) REFERENCES case_41_parent (id) ON DELETE CASCADE ON UPDATE SET NULL;

-- ==== stage: checks ====

ALTER TABLE case_13_enum_set ADD CONSTRAINT e1_enum_chk CHECK (e1 IN ('a', 'b', 'c'));

ALTER TABLE case_13_enum_set ADD CONSTRAINT s1_set_chk CHECK (string_to_array(s1, ',') <@ ARRAY['x', 'y', 'z']::text[]);

ALTER TABLE case_27_mysql8_check ADD CONSTRAINT chk_age CHECK (age > 18);

-- SKIP [case_27_mysql8_check]: CHECK 'age < 150' is NOT ENFORCED in MySQL (documentation-only); PostgreSQL's NOT VALID still enforc

ALTER TABLE case_35_enum_charset ADD CONSTRAINT col_enum_enum_chk CHECK (col_enum IN ('N', 'Y'));

ALTER TABLE case_35_enum_charset ADD CONSTRAINT col_set_set_chk CHECK (string_to_array(col_set, ',') <@ ARRAY['A', 'B']::text[]);

ALTER TABLE case_61_many_columns ADD CONSTRAINT enum_min_enum_chk CHECK (enum_min IN ('a'));

ALTER TABLE case_61_many_columns ADD CONSTRAINT enum_max_enum_chk CHECK (enum_max IN ('a', 'b', 'c', 'd', 'e'));

ALTER TABLE case_61_many_columns ADD CONSTRAINT set_min_set_chk CHECK (string_to_array(set_min, ',') <@ ARRAY['x']::text[]);

ALTER TABLE case_61_many_columns ADD CONSTRAINT set_max_set_chk CHECK (string_to_array(set_max, ',') <@ ARRAY['x', 'y', 'z']::text[]);

-- ==== stage: functions ====

CREATE OR REPLACE FUNCTION get_joined_data(p_id INTEGER)
RETURNS VARCHAR(255)
STABLE AS $$
DECLARE
    result VARCHAR(255);
BEGIN
    SELECT 
        ('Int: ' || i.col_int || ', Bool: ' || b.is_active || ', Float: ' || f.col_float || ', Char: ' || c.col_var_mb3 || ', Charset: ' || cs.c1)
    FROM 
        case_01_integers i
    INNER JOIN 
        case_02_boolean b ON i.col_int = b.status
    INNER JOIN 
        case_03_floats f ON i.col_int = b.status
    INNER JOIN 
        case_04_mb3_suffix c ON i.col_int = b.status
    INNER JOIN 
        case_05_charsets cs ON i.col_int = b.status
    WHERE 
        i.col_int = p_id
    INTO result;
    RETURN result;
END;
$$ LANGUAGE plpgsql;

CREATE OR REPLACE FUNCTION get_combined_data(p_status INTEGER)
RETURNS VARCHAR(255)
STABLE AS $$
DECLARE
    result VARCHAR(255);
BEGIN
    SELECT 
        ('Status: ' || p_status || ', Integer Data: ' || COALESCE(i.col_int, 'N/A') || ', Boolean Data: ' || COALESCE(b.is_active, 'N/A') || ', Float Data: ' || COALESCE(f.col_float, 'N/A'))
    FROM 
        case_01_integers i
    LEFT JOIN 
        case_02_boolean b ON i.col_int = b.status
    RIGHT JOIN 
        case_03_floats f ON b.status = f.col_float
    WHERE 
        b.status = p_status
    ORDER BY 
        i.col_int ASC
    LIMIT 1
    INTO result;
    RETURN result;
END;
$$ LANGUAGE plpgsql;

CREATE OR REPLACE FUNCTION get_detailed_data(p_id INTEGER)
RETURNS VARCHAR(255)
STABLE AS $$
DECLARE
    result VARCHAR(255);
BEGIN
    SELECT 
        ('ID: ' || p_id || ', Integer Value: ' || i.col_int || ', Boolean Status: ' || b.is_active || ', Float Value: ' || f.col_float || ', String Value: ' || c.col_var_mb3 || ', Charset Value: ' || cs.c1)
    FROM 
        case_01_integers i
    INNER JOIN 
        case_02_boolean b ON i.col_int = b.status AND b.is_active = 1
    INNER JOIN 
        case_03_floats f ON b.status = p_id AND f.col_float > 0
    INNER JOIN 
        case_04_mb3_suffix c ON b.status = p_id
    INNER JOIN 
        case_05_charsets cs ON b.status = p_id
    WHERE 
        i.col_int = p_id
    LIMIT 1
    INTO result;
    RETURN result;
END;
$$ LANGUAGE plpgsql;

-- ==== stage: users ====

CREATE ROLE "test1" LOGIN;

-- database-wide grant has no table analog: GRANT ALL PRIVILEGES ON *.* TO 'test1'@'%';

CREATE ROLE "test2" LOGIN;

-- database-wide grant has no table analog: GRANT ALL PRIVILEGES ON *.* TO 'test2'@'%';

-- ==== stage: table_privileges ====

GRANT ALL ON case_01_integers TO test1;

GRANT ALL ON case_02_boolean TO test1;

GRANT ALL ON case_03_floats TO test1;

GRANT ALL ON case_04_mb3_suffix TO test1;

GRANT ALL ON case_01_integers TO test2;

GRANT ALL ON case_02_boolean TO test2;
