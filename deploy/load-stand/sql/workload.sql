-- One workload round: mixed insert/update/delete, enough churn that
-- every op class and both tables appear in the WAL. Run in a loop by
-- the workload service (ROUNDS env).
INSERT INTO users (name, email)
SELECT 'user-' || g, 'user-' || g || '@example.test'
FROM generate_series(1, 500) g;

INSERT INTO orders (user_id, amount)
SELECT (random() * 400 + 1)::bigint, round((random() * 500)::numeric, 2)
FROM generate_series(1, 1000) g;

UPDATE users SET email = email || '.x', updated_at = now()
WHERE id IN (SELECT id FROM users ORDER BY random() LIMIT 100);

UPDATE orders SET status = 'shipped'
WHERE id IN (SELECT id FROM orders WHERE status = 'new' ORDER BY random() LIMIT 200);

DELETE FROM orders
WHERE id IN (SELECT id FROM orders ORDER BY random() LIMIT 50);
