-- Golden plpgsql for the reference corpus routines
-- (scripts/mysql/create_function.sql), as emitted by the C95
-- translator. Regenerate: python tools/dump_corpus_functions.py

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
